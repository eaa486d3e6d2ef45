"""Jupyter notebook (.ipynb) extraction — the dominant shape of
code-adjacent corpora scraped from GitHub/Kaggle. Public format
only (the nbformat JSON schema): version 4 keeps ``cells`` at the
top level, a cell's ``source`` may legally be EITHER a string or a
list of lines, and code-cell ``outputs`` carry streams,
execute_results/display_data mime bundles (base64 images included)
and error tracebacks — none of which is corpus text, all of which
a naive extractor leaks. Legacy version 3 (still common in old
crawls) nests cells under ``worksheets``, names code source
``input``, and has dedicated ``heading`` cells.

Extraction rules: cells in order, both source spellings joined,
v3 normalized to the v4 view (worksheets flattened, ``input`` read,
heading cells become markdown text); outputs are COUNTED and
excluded; markdown cells pass through the markdown reducer
(``functions/markdown.py``) so markup strips from corpus text;
code-cell sources are kept verbatim (code corpora want exact
bytes); raw cells pass through untouched.

Corrupt-input discipline: non-JSON, a payload without cells (or
worksheets), or a cell without a recognizable source raise the
named NotebookError — never a silently empty notebook.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import json

from core_spark.functions.markdown import md_to_text


class NotebookError(ValueError):
    """Named parse failure: corrupt or non-ipynb input."""


def _source_text(cell: dict, key: str) -> str:
    src = cell.get(key)
    if src is None:
        raise NotebookError(f"cell has no {key!r}")
    if isinstance(src, list):
        return "".join(src)
    if isinstance(src, str):
        return src
    raise NotebookError(f"cell {key!r} is neither string nor list")


def ipynb_cells(raw: bytes | str) -> list[dict]:
    """Parse a notebook into cells: one dict per cell —
    {cell_idx, cell_type ('markdown' | 'code' | 'raw'), text,
    n_lines, n_outputs} — v3 and v4 normalized to the same view,
    markdown reduced, outputs counted and excluded."""
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", errors="replace")
    try:
        nb = json.loads(raw)
    except ValueError as e:
        raise NotebookError(f"not JSON: {e}")
    if not isinstance(nb, dict):
        raise NotebookError("notebook is not a JSON object")
    if "cells" in nb:
        cells = nb["cells"]
    elif "worksheets" in nb:
        cells = [
            c
            for ws in nb["worksheets"]
            if isinstance(ws, dict)
            for c in ws.get("cells", [])
        ]
    else:
        raise NotebookError("no cells or worksheets in notebook")
    if not isinstance(cells, list):
        raise NotebookError("cells is not a list")
    out: list[dict] = []
    for cell in cells:
        if not isinstance(cell, dict):
            raise NotebookError(f"cell {len(out)} is not an object")
        ctype = cell.get("cell_type", "")
        if ctype == "code":
            key = "source" if "source" in cell else "input"
            text = _source_text(cell, key)
            n_out = len(cell.get("outputs", []) or [])
            norm_type = "code"
        elif ctype == "heading":  # v3
            text = _source_text(cell, "source")
            norm_type = "markdown"
        elif ctype == "markdown":
            text = md_to_text(_source_text(cell, "source"))["text"]
            norm_type = "markdown"
            n_out = 0
        elif ctype == "raw":
            text = _source_text(cell, "source")
            norm_type = "raw"
        else:
            raise NotebookError(
                f"unknown cell_type {ctype!r} at cell {len(out)}"
            )
        if ctype != "code":
            n_out = 0
        out.append(
            {
                "cell_idx": len(out),
                "cell_type": norm_type,
                "text": text.rstrip("\n"),
                "n_lines": max(1, text.rstrip("\n").count("\n") + 1),
                "n_outputs": n_out,
            }
        )
    return out


# ------------------------------------------------------------ fixture

_CELL_WORDS = 12


def build_ipynb_fixture(text: str, digest: str) -> bytes:
    """Deterministic notebook for q_cc_ipynb: the text in 12-word
    chunks, chunk k becoming a markdown cell (even k) or a code
    cell ``print("<chunk>")`` (odd k); the REPRESENTATION rotates
    on an md5 nibble (`digest[-4]` % 4) while the normalized cells
    stay identical:

    - 0 nbformat 4, source as LIST of lines;
    - 1 nbformat 4, source as plain strings, every code cell
      carrying two outputs (a stream and an execute_result with a
      base64 png sibling) plus one error output on the first —
      counted, never leaked into text;
    - 2 nbformat 4 plus a trailing RAW cell (content digest[:8]);
    - 3 legacy nbformat 3: worksheets wrapper, code ``input`` key,
      the first markdown chunk as a dedicated heading cell."""
    words = text.split(" ")
    form = int(digest[-4], 16) % 4
    chunks = [
        " ".join(words[i : i + _CELL_WORDS])
        for i in range(0, len(words), _CELL_WORDS)
    ]
    cells = []
    for k, ch in enumerate(chunks):
        if k % 2 == 0:
            if form == 3 and k == 0:
                cells.append(
                    {
                        "cell_type": "heading",
                        "level": 1,
                        "source": ch,
                    }
                )
            else:
                src = [ch] if form == 0 else ch
                cells.append(
                    {"cell_type": "markdown", "source": src}
                )
        else:
            code = f'print("{ch}")'
            if form == 3:
                cells.append(
                    {
                        "cell_type": "code",
                        "input": code,
                        "outputs": [],
                        "language": "python",
                    }
                )
                continue
            outputs = []
            if form == 1:
                outputs = [
                    {
                        "output_type": "stream",
                        "name": "stdout",
                        "text": [ch + "\n"],
                    },
                    {
                        "output_type": "execute_result",
                        "data": {
                            "text/plain": ["'" + ch + "'"],
                            "image/png": "iVBORw0KGgoAAAANSUhEUg==",
                        },
                        "execution_count": k,
                    },
                ]
                if k == 1:
                    outputs.append(
                        {
                            "output_type": "error",
                            "ename": "ValueError",
                            "evalue": "NOT CORPUS TEXT",
                            "traceback": ["Traceback..."],
                        }
                    )
            cells.append(
                {
                    "cell_type": "code",
                    "source": [code] if form == 0 else code,
                    "outputs": outputs,
                    "execution_count": k,
                }
            )
    if form == 2:
        cells.append({"cell_type": "raw", "source": digest[:8]})
    if form == 3:
        nb = {
            "nbformat": 3,
            "nbformat_minor": 0,
            "metadata": {"name": "legacy"},
            "worksheets": [{"cells": cells}],
        }
    else:
        nb = {
            "nbformat": 4,
            "nbformat_minor": 5,
            "metadata": {
                "kernelspec": {"name": "python3", "language": "python"}
            },
            "cells": cells,
        }
    return json.dumps(nb).encode("utf-8")


def _expected_cells(text: str, digest: str) -> list[dict]:
    words = text.split(" ")
    form = int(digest[-4], 16) % 4
    chunks = [
        " ".join(words[i : i + _CELL_WORDS])
        for i in range(0, len(words), _CELL_WORDS)
    ]
    out = []
    for k, ch in enumerate(chunks):
        if k % 2 == 0:
            out.append(("markdown", ch, 0))
        else:
            n_out = (3 if k == 1 else 2) if form == 1 else 0
            out.append(("code", f'print("{ch}")', n_out))
    if form == 2:
        out.append(("raw", digest[:8], 0))
    return [
        {
            "cell_idx": i,
            "cell_type": t,
            "text": x,
            "n_lines": 1,
            "n_outputs": n,
        }
        for i, (t, x, n) in enumerate(out)
    ]
