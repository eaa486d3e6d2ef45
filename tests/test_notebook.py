"""Notebook extraction pins: both source spellings, output
exclusion with counts, v3 normalization, markdown reduction inside
cells, and named-error hostile paths."""

from __future__ import annotations

import hashlib
import json

import pytest

from core_spark.functions.notebook import (
    NotebookError,
    _expected_cells,
    build_ipynb_fixture,
    ipynb_cells,
)


def test_all_forms_round_trip():
    seen = set()
    for i in range(160):
        t = " ".join(f"w{i}x{k}" for k in range(1 + i % 45))
        h = hashlib.md5(t.encode()).hexdigest()
        seen.add(int(h[-4], 16) % 4)
        assert ipynb_cells(
            build_ipynb_fixture(t, h)
        ) == _expected_cells(t, h)
    assert seen == {0, 1, 2, 3}


def _nb4(cells):
    return json.dumps({"nbformat": 4, "cells": cells}).encode()


def test_source_spellings_equal():
    a = ipynb_cells(
        _nb4([{"cell_type": "code", "source": "x = 1\ny = 2"}])
    )
    b = ipynb_cells(
        _nb4([{"cell_type": "code", "source": ["x = 1\n", "y = 2"]}])
    )
    assert a[0]["text"] == b[0]["text"] == "x = 1\ny = 2"
    assert a[0]["n_lines"] == 2


def test_outputs_counted_never_leaked():
    cells = [
        {
            "cell_type": "code",
            "source": "plot()",
            "outputs": [
                {"output_type": "stream", "text": ["SECRET STDOUT"]},
                {
                    "output_type": "display_data",
                    "data": {"image/png": "aWtub3c="},
                },
                {
                    "output_type": "error",
                    "ename": "E",
                    "evalue": "SECRET TRACE",
                    "traceback": ["SECRET TRACE"],
                },
            ],
        }
    ]
    (c,) = ipynb_cells(_nb4(cells))
    assert c["n_outputs"] == 3
    assert "SECRET" not in c["text"] and "aWtub3c" not in c["text"]


def test_markdown_cells_reduced():
    (c,) = ipynb_cells(
        _nb4(
            [
                {
                    "cell_type": "markdown",
                    "source": "# Title\n\n**bold** [x](https://e.com)",
                }
            ]
        )
    )
    assert c["text"] == "Title\nbold x"


def test_v3_normalization():
    nb = {
        "nbformat": 3,
        "worksheets": [
            {
                "cells": [
                    {"cell_type": "heading", "level": 2, "source": "H"},
                    {
                        "cell_type": "code",
                        "input": "z = 3",
                        "outputs": [{"output_type": "stream"}],
                    },
                ]
            }
        ],
    }
    cells = ipynb_cells(json.dumps(nb).encode())
    assert cells[0] == {
        "cell_idx": 0,
        "cell_type": "markdown",
        "text": "H",
        "n_lines": 1,
        "n_outputs": 0,
    }
    assert cells[1]["cell_type"] == "code"
    assert cells[1]["text"] == "z = 3"
    assert cells[1]["n_outputs"] == 1


def test_hostile_refusals():
    with pytest.raises(NotebookError, match="not JSON"):
        ipynb_cells(b"{broken json")
    with pytest.raises(NotebookError, match="no cells"):
        ipynb_cells(b'{"nbformat": 4}')
    with pytest.raises(NotebookError, match="unknown cell_type"):
        ipynb_cells(_nb4([{"cell_type": "mystery", "source": "x"}]))
    with pytest.raises(NotebookError, match="no 'source'"):
        ipynb_cells(_nb4([{"cell_type": "markdown"}]))
    with pytest.raises(NotebookError, match="not a JSON object"):
        ipynb_cells(b"[1, 2, 3]")
