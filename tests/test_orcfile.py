"""ORC tail walk discipline (functions/orcfile.py) — cross-checked
against pyarrow's own reader on bytes the pyarrow WRITER produced."""

import io

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from core_spark.functions.orcfile import OrcError, parse_orc_tail


def _file(vals, compression="uncompressed", **kw) -> bytes:
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"v": pa.array(vals, type=pa.int64()),
                  "s": pa.array([f"s{i}" for i in range(len(vals))])}),
        buf, compression=compression, **kw,
    )
    return buf.getvalue()


def test_agrees_with_pyarrow_both_compressions():
    for comp in ("uncompressed", "zlib", "snappy", "lz4"):
        raw = _file([5, -3, 17, 9, 2, -64], compression=comp)
        got = parse_orc_tail(raw)
        f = orc.ORCFile(io.BytesIO(raw))
        assert got["n_rows"] == f.nrows == 6
        assert len(got["stripes"]) == f.nstripes == 1
        assert got["stripes"][0]["n_rows"] == 6
        # col 0 is the struct root; col 1 is v
        assert got["stats"][1]["int"] == {
            "min": -64, "max": 17, "sum": -34
        }
        assert got["types"][0]["kind"] == "struct"
        assert got["types"][0]["field_names"] == ["v", "s"]
        assert got["types"][1]["kind"] == "long"
        assert got["types"][2]["kind"] == "string"


def test_multi_stripe_offsets_match_pyarrow():
    """Stripe boundaries are the split plan: rows and offsets must
    match pyarrow's reader stripe-by-stripe, strictly increasing."""
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"v": pa.array(range(3000), type=pa.int64())}),
        buf, stripe_size=8192,
    )
    raw = buf.getvalue()
    got = parse_orc_tail(raw)
    f = orc.ORCFile(io.BytesIO(raw))
    assert len(got["stripes"]) == f.nstripes >= 2
    assert [s["n_rows"] for s in got["stripes"]] == [
        f.read_stripe(i).num_rows for i in range(f.nstripes)
    ]
    offs = [s["offset"] for s in got["stripes"]]
    assert offs == sorted(offs)
    assert all(3 <= o < len(raw) for o in offs)
    assert sum(s["n_rows"] for s in got["stripes"]) == got["n_rows"]


def test_corrupt_inputs_raise_named_error():
    raw = _file([1, 2, 3])
    for bad in (
        b"",
        b"ORC",
        b"XXX" + raw[3:],                      # wrong head magic
        raw[:-1] + bytes([250]),               # ps length escapes
        raw[: len(raw) // 2],                  # truncated mid-file
    ):
        with pytest.raises(OrcError):
            parse_orc_tail(bad)
    # flip a byte inside the postscript magic
    evil = bytearray(raw)
    evil[-2] ^= 0xFF
    with pytest.raises(OrcError):
        parse_orc_tail(bytes(evil))


def test_zstd_footer_deframes_with_the_from_spec_decoder():
    # pyarrow's C zstd encoder writes the footer; our RFC 8878
    # decoder (functions/zstd_decode.py) must read it back.
    raw = _file(list(range(4000)), compression="zstd")
    tail = parse_orc_tail(raw)
    assert tail["compression"] == "zstd"
    assert tail["n_rows"] == 4000
    assert tail["stats"][1]["int"]["min"] == 0
    assert tail["stats"][1]["int"]["max"] == 3999


def test_unsupported_codec_raises_naming_kind():
    from core_spark.functions.orcfile import _deframe

    with pytest.raises(OrcError, match="lzo"):
        _deframe(b"\x02\x00\x00xx", "lzo")


def test_random_tails_never_hang_or_fabricate():
    import random

    rng = random.Random(7)
    for _ in range(200):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(48)))
        try:
            parse_orc_tail(b"ORC" + blob + bytes([len(blob)]))
        except OrcError:
            pass  # the only acceptable failure shape
