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


# ----------------------------------------------------- value decode
def test_rlev2_pins_against_the_spec_vectors():
    """The four RLEv2 sub-encodings against the Apache ORC spec's
    own example byte sequences."""
    from core_spark.functions.orcfile import _rlev2

    assert _rlev2(bytes([0x0A, 0x27, 0x10]), signed=False) == [10000] * 5
    assert _rlev2(
        bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF]),
        signed=False,
    ) == [23713, 43806, 57005, 48879]
    assert _rlev2(
        bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46]),
        signed=False,
    ) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    patched = bytes([
        0x8E, 0x13, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14, 0x70,
        0x28, 0x32, 0x3C, 0x46, 0x50, 0x5A, 0x64, 0x6E, 0x78, 0x82,
        0x8C, 0x96, 0xA0, 0xAA, 0xB4, 0xBE, 0xFC, 0xE8,
    ])
    assert _rlev2(patched, signed=False) == (
        [2030, 2000, 2020, 1000000] + list(range(2040, 2200, 10))
    )


def _typed_orc(compression="zstd", n=5000, stripe_size=64 * 1024):
    sch = pa.schema([
        pa.field("i", pa.int64(), nullable=False),
        pa.field("j", pa.int32(), nullable=False),
        pa.field("b", pa.bool_(), nullable=False),
        pa.field("f", pa.float64(), nullable=False),
        pa.field("s", pa.string(), nullable=False),
        pa.field("score", pa.int64(), nullable=True),
    ])
    t = pa.table(
        {
            "i": [k * k - 9000 * k for k in range(n)],
            "j": pa.array([k % 97 for k in range(n)], pa.int32()),
            "b": [k % 3 == 0 for k in range(n)],
            "f": [k * 0.25 - 8.0 for k in range(n)],
            "s": [f"w{k % 41}" for k in range(n)],
            "score": [None if k % 5 == 0 else k for k in range(n)],
        },
        schema=sch,
    )
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=compression, stripe_size=stripe_size)
    return buf.getvalue(), t


@pytest.mark.parametrize(
    "compression", ["zstd", "snappy", "zlib", "lz4", "uncompressed"]
)
def test_read_orc_column_pins_against_pyarrow(compression):
    from core_spark.functions.orcfile import read_orc_column

    raw, t = _typed_orc(compression=compression)
    for name in ("i", "j", "b", "f", "s", "score"):
        assert read_orc_column(raw, name) == t[name].to_pylist()


def test_read_orc_column_outlier_and_corrupt_shapes():
    from core_spark.functions.orcfile import read_orc_column

    # outliers force PATCHED_BASE through a real writer
    sch = pa.schema([pa.field("v", pa.int64(), nullable=False)])
    vals = [2000 + k * 10 for k in range(512)]
    vals[3] = 10**9
    vals[200] = -(10**8)
    t = pa.table({"v": vals}, schema=sch)
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zstd")
    assert read_orc_column(buf.getvalue(), "v") == vals

    raw, _ = _typed_orc()
    with pytest.raises(OrcError, match="no column"):
        read_orc_column(raw, "nope")
    with pytest.raises(OrcError):
        read_orc_column(raw[: len(raw) // 2] + raw[-200:], "i")


def _pack_msb(bits_values):
    """Bit-pack (width, value) pairs MSB-first into bytes."""
    acc = nbits = 0
    out = bytearray()
    for w, v in bits_values:
        acc = (acc << w) | (v & ((1 << w) - 1))
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_patched_base_entry_width_rounds_to_closest_fixed_bits():
    """Spec pin for the r9 ADVICE defect: patch entries are packed at
    getClosestFixedBits(pgw + pw) — here pgw=5, pw=20 so the raw sum
    25 is NOT a fixed width and each entry occupies 26 bits. A reader
    that consumes 25 bits per entry misaligns from the second entry
    on (orc-format spec, RunLengthIntegerWriterV2.writePatchedBase-
    Values / getClosestFixedBits)."""
    from core_spark.functions.orcfile import _rlev2

    w, ln, bw, pw, pgw, pl, base = 16, 10, 1, 20, 5, 2, 100
    vals = [k * 1000 + 7 for k in range(ln)]
    patches = {2: 0xABCDE, 9: 0x12345}  # 20-bit patch payloads
    hdr = bytes([
        (2 << 6) | (15 << 1) | ((ln - 1) >> 8),  # enc=2, w=16 (idx 15)
        (ln - 1) & 0xFF,
        ((bw - 1) << 5) | 19,                    # pw=20 (idx 19)
        ((pgw - 1) << 5) | pl,
        base,                                    # 1-byte base, positive
    ])
    entries = []
    prev = 0
    for idx in sorted(patches):
        entries.append((26, ((idx - prev) << pw) | patches[idx]))
        prev = idx
    body = _pack_msb([(w, v) for v in vals] + entries)
    got = _rlev2(hdr + body, signed=False)
    want = [
        base + (vals[k] | (patches[k] << w) if k in patches else vals[k])
        for k in range(ln)
    ]
    assert got == want


def test_patched_base_fuzz_skewed_int64_against_pyarrow():
    """Deterministic sweep of skewed int64 columns through the REAL
    pyarrow/liborc writer: outlier magnitudes walk the 17-40 extra-bit
    band so pw+pgw crosses non-table widths (25, 27, 29, 31, 33-39)
    — the shapes that misaligned before the width round-up fix."""
    import random

    from core_spark.functions.orcfile import read_orc_column

    rng = random.Random(0xC0FFEE)
    for trial in range(60):
        n = rng.randrange(300, 1200)
        base = rng.randrange(-(10**6), 10**6)
        small_bits = rng.randrange(4, 20)
        vals = [base + rng.getrandbits(small_bits) for _ in range(n)]
        for _ in range(rng.randrange(1, 12)):
            pos = rng.randrange(n)
            extra = rng.randrange(17, 40)
            vals[pos] = base + rng.getrandbits(small_bits + extra)
        t = pa.table({"v": pa.array(vals, pa.int64())})
        buf = io.BytesIO()
        orc.write_table(t, buf, compression="uncompressed")
        assert read_orc_column(buf.getvalue(), "v") == vals, f"trial {trial}"


def test_rlev1_spec_shapes():
    """RLE v1 unit shapes straight off the spec: runs with positive,
    negative and zero deltas, literal groups, signed zigzag values,
    and truncation raising the named error."""
    from core_spark.functions.orcfile import _rlev1, OrcError as _E

    # run: header 2 => 5 values, delta +1, base 7 (unsigned varint)
    assert _rlev1(bytes([2, 1, 7]), signed=False) == [7, 8, 9, 10, 11]
    # run with negative delta: base 100, delta -2, 4 values
    assert _rlev1(bytes([1, 0xFE, 100]), signed=False) == [100, 98, 96, 94]
    # literals: header 0xFD => 3 varints; signed zigzag
    assert _rlev1(
        bytes([0xFD, 0x02, 0x01, 0x04]), signed=True
    ) == [1, -1, 2]
    # mixed run + literals
    assert _rlev1(
        bytes([0, 1, 5, 0xFF, 0x0A]), signed=False
    ) == [5, 6, 7, 10]
    with pytest.raises(_E):
        _rlev1(bytes([2, 1]), signed=False)  # run escapes
    with pytest.raises(_E):
        _rlev1(bytes([0xFD, 0x02]), signed=True)  # literals escape


# ----------------------------------------------------- list columns
def test_list_column_roundtrip_all_codecs():
    """ORC list decode pinned against pyarrow: null list / empty
    list / null element across every codec the deframer speaks,
    int64/string/double elements."""
    import io

    import pyarrow as pa
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import read_orc_list_column

    data = [[1, 2, 3], None, [], [4, None, 5], [None], [6], None, [7, 8]]
    sdata = [["a", "bb", None], [], None, ["ccc"], ["d"], [], ["e"], []]
    fdata = [[1.5], None, [], [3.25, None], [4.0], [5.0], [], None]
    t = pa.table(
        {
            "xs": pa.array(data, type=pa.list_(pa.int64())),
            "ss": pa.array(sdata, type=pa.list_(pa.string())),
            "fs": pa.array(fdata, type=pa.list_(pa.float64())),
        }
    )
    for comp in ("UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD", "LZ4"):
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=comp)
        raw = buf.getvalue()
        assert read_orc_list_column(raw, "xs") == data, comp
        assert read_orc_list_column(raw, "ss") == sdata, comp
        assert read_orc_list_column(raw, "fs") == fdata, comp


def test_list_column_multi_stripe_and_fences():
    import io

    import pyarrow as pa
    import pytest as _pytest
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import (
        OrcError,
        parse_orc_tail,
        read_orc_column,
        read_orc_list_column,
    )

    big = [[i, i + 1] if i % 3 else None for i in range(5000)]
    t = pa.table({"xs": pa.array(big, type=pa.list_(pa.int64()))})
    buf = io.BytesIO()
    pa_orc.write_table(t, buf, stripe_size=64 * 1024)
    raw = buf.getvalue()
    assert len(parse_orc_tail(raw)["stripes"]) > 1  # really multi-stripe
    assert read_orc_list_column(raw, "xs") == big

    # doubly-nested lists reassemble (r11 lifted the one-level fence)
    nd = [[[1]], None, [], [None, [2, None], []]]
    t3 = pa.table(
        {"n": pa.array(nd, type=pa.list_(pa.list_(pa.int64())))}
    )
    buf3 = io.BytesIO()
    pa_orc.write_table(t3, buf3)
    assert read_orc_list_column(buf3.getvalue(), "n") == nd
    with _pytest.raises(OrcError, match="use read_orc_list_column"):
        read_orc_column(buf3.getvalue(), "n")
    with _pytest.raises(OrcError, match="not a list"):
        t4 = pa.table({"a": pa.array([1], type=pa.int64())})
        buf4 = io.BytesIO()
        pa_orc.write_table(t4, buf4)
        read_orc_list_column(buf4.getvalue(), "a")


def test_list_column_property_fuzz():
    """Hypothesis twin of the parquet list fuzz: any one-level
    list<int64> shape, any codec, any stripe split, reassembles
    exactly as pyarrow's ORC writer meant."""
    import io

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import read_orc_list_column

    lists = st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(
                    st.none(),
                    st.integers(min_value=-(2**62), max_value=2**62),
                ),
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=24,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        data=lists,
        codec=st.sampled_from(["UNCOMPRESSED", "ZLIB", "ZSTD"]),
    )
    def prop(data, codec):
        t = pa.table({"xs": pa.array(data, type=pa.list_(pa.int64()))})
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=codec)
        assert read_orc_list_column(buf.getvalue(), "xs") == data

    prop()


def test_decimal_column_roundtrip_and_scales():
    """ORCv1 decimal: unbounded zigzag-varint mantissas + SECONDARY
    scale stream, pinned against pyarrow incl. negatives, zero,
    nulls, a high-precision fuzz, and list<decimal>."""
    import decimal
    import io
    import random

    import pyarrow as pa
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import (
        read_orc_column,
        read_orc_list_column,
    )

    D = decimal.Decimal
    vals = [D("12.34"), None, D("-0.05"), D("99999.99"), D("0.00")]
    t = pa.table({"d": pa.array(vals, type=pa.decimal128(12, 2))})
    for comp in ("UNCOMPRESSED", "ZLIB", "ZSTD", "SNAPPY"):
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=comp)
        assert read_orc_column(buf.getvalue(), "d") == vals, comp

    rng = random.Random(7)
    rv = [
        None if rng.random() < 0.2
        else D(rng.randrange(-10**17, 10**17)).scaleb(-4)
        for _ in range(500)
    ]
    t2 = pa.table({"d": pa.array(rv, type=pa.decimal128(22, 4))})
    buf = io.BytesIO()
    pa_orc.write_table(t2, buf, stripe_size=64 * 1024)
    assert read_orc_column(buf.getvalue(), "d") == rv

    ld = [[D("1.50"), None], None, [], [D("-2.25")]]
    t3 = pa.table({"xs": pa.array(ld, type=pa.list_(pa.decimal128(10, 2)))})
    buf = io.BytesIO()
    pa_orc.write_table(t3, buf)
    assert read_orc_list_column(buf.getvalue(), "xs") == ld

    # decimal(38,2) with mantissas near 2^126: the varint runs to 19
    # base-128 bytes, wider than the 10-byte protobuf wire (the r10
    # reader capped at 10 and raised on this valid file).
    big = [
        D("999999999999999999999999999999999999.99"),
        D("-999999999999999999999999999999999999.99"),
        None,
        D("0.01"),
        D(rng.randrange(-(10**38) + 1, 10**38)).scaleb(-2),
    ]
    t4 = pa.table({"d": pa.array(big, type=pa.decimal128(38, 2))})
    buf = io.BytesIO()
    pa_orc.write_table(t4, buf, compression="UNCOMPRESSED")
    assert read_orc_column(buf.getvalue(), "d") == big


def _ns_to_dt(n):
    import datetime as dt

    if n is None:
        return None
    return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=n // 1000)


def test_timestamp_decode_pins_against_pyarrow():
    """ORC TIMESTAMP (r11 — decision over the r10 fence): base-2015
    seconds + trailing-zero-packed nanos, SIGNED per the C++ writer's
    pre-1970 convention, epoch-nanos ints out. Pinned value-exact
    against pyarrow incl. pre-1970, pre-2015, the 2015 base itself,
    nulls, multi-stripe and every codec; TIMESTAMP_INSTANT (kind 18)
    decodes as UTC."""
    import datetime as dt
    import io
    import random

    from core_spark.functions.orcfile import read_orc_column

    vals = [
        dt.datetime(2020, 1, 1, 12, 34, 56, 789000),
        dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
        dt.datetime(2015, 1, 1),
        dt.datetime(1955, 6, 1, 0, 0, 0, 1),
        None,
        dt.datetime(1970, 1, 1),
        dt.datetime(2038, 1, 19, 3, 14, 8, 999999),
    ]
    t = pa.table({"ts": pa.array(vals, type=pa.timestamp("us"))})
    for comp in ("UNCOMPRESSED", "ZSTD", "ZLIB", "SNAPPY"):
        buf = io.BytesIO()
        orc.write_table(t, buf, compression=comp)
        got = [_ns_to_dt(n) for n in read_orc_column(buf.getvalue(), "ts")]
        assert got == vals, comp

    # random fuzz across two centuries, multi-stripe
    rng = random.Random(0x715)
    fuzz = [
        None
        if rng.random() < 0.1
        else dt.datetime(1970, 1, 1)
        + dt.timedelta(
            seconds=rng.randrange(-2_000_000_000, 2_000_000_000),
            microseconds=rng.randrange(0, 1_000_000),
        )
        for _ in range(3000)
    ]
    t2 = pa.table({"ts": pa.array(fuzz, type=pa.timestamp("us"))})
    buf = io.BytesIO()
    orc.write_table(t2, buf, stripe_size=64 * 1024)
    from core_spark.functions.orcfile import parse_orc_tail

    assert len(parse_orc_tail(buf.getvalue())["stripes"]) > 1
    got = [_ns_to_dt(n) for n in read_orc_column(buf.getvalue(), "ts")]
    assert got == fuzz

    # TIMESTAMP_INSTANT (timezone-aware arrow type)
    iv = [dt.datetime(2020, 1, 1), None]
    t3 = pa.table({"ts": pa.array(iv, type=pa.timestamp("us", tz="UTC"))})
    buf = io.BytesIO()
    orc.write_table(t3, buf)
    assert [_ns_to_dt(n) for n in read_orc_column(buf.getvalue(), "ts")] == iv


def test_timestamp_decode_pins_against_spark_java_orc_writer(
    spark, tmp_path
):
    """The Java encoder's convention (floor seconds + positive nanos;
    the boundary second 1969-12-31 23:59:59.x famously writes as
    1970-01-01 00:00:00.x — a WRITER quirk both Spark and pyarrow
    read back as such): our decode must match what Spark itself
    reads back from its own file, value for value."""
    import datetime as dt
    import glob

    from core_spark.functions.orcfile import read_orc_column

    vals = [
        dt.datetime(2020, 1, 1, 12, 34, 56, 789000),
        dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
        dt.datetime(2015, 1, 1),
        dt.datetime(1955, 6, 1, 0, 0, 0, 1),
        None,
        dt.datetime(1970, 1, 1),
        dt.datetime(2038, 1, 19, 3, 14, 8, 999999),
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id int, ts timestamp"
        )
        out = str(tmp_path / "ts_orc")
        df.coalesce(1).write.mode("overwrite").orc(out)
        (path,) = glob.glob(out + "/*.orc")
        raw = open(path, "rb").read()
        back = {r["id"]: r["ts"] for r in spark.read.orc(out).collect()}
        ids = read_orc_column(raw, "id")
        tss = read_orc_column(raw, "ts")
        for rid, n in zip(ids, tss):
            assert _ns_to_dt(n) == back[rid]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_decimal_truncated_mantissa_raises_named():
    import decimal
    import io

    import pyarrow as pa
    import pytest as _pytest
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import (
        OrcError,
        parse_orc_tail,
        read_orc_column,
    )

    t = pa.table(
        {"d": pa.array([decimal.Decimal("1.23")] * 40,
                       type=pa.decimal128(10, 2))}
    )
    buf = io.BytesIO()
    pa_orc.write_table(t, buf, compression="UNCOMPRESSED")
    raw = bytearray(buf.getvalue())
    # blank the stripe data region: varints never complete
    tail = parse_orc_tail(bytes(raw))
    st = tail["stripes"][0]
    for k in range(st["offset"], st["offset"] + st["data_len"]):
        raw[k] = 0x80  # continuation bit forever
    with _pytest.raises(OrcError):
        read_orc_column(bytes(raw), "d")


def test_reader_against_spark_java_orc_writer(spark, tmp_path):
    """Interop with the OTHER major ORC encoder: Spark's Java writer
    (different RLEv2 sub-encoding choices than pyarrow's C++) —
    long, dictionary-able strings, list<long> and decimal columns
    all reassemble to what Spark itself reads back."""
    import glob

    from pyspark.sql import functions as F

    from core_spark.functions.orcfile import (
        read_orc_column,
        read_orc_list_column,
    )

    out = str(tmp_path / "orc_java")
    df = spark.range(2000).select(
        F.col("id").alias("a"),
        (F.col("id") * 37 % 1000).alias("skewed"),
        F.concat(F.lit("w"), (F.col("id") % 50).cast("string")).alias("s"),
        F.when(
            F.col("id") % 5 != 0, F.array(F.col("id"), F.col("id") * 2)
        ).alias("xs"),
        (F.col("id").cast("decimal(12,2)") / 7).alias("d"),
    )
    df.coalesce(1).write.mode("overwrite").orc(out)
    raw = open(glob.glob(out + "/part-*.orc")[0], "rb").read()
    by_a = {r["a"]: r for r in df.collect()}
    order = read_orc_column(raw, "a")
    assert sorted(order) == list(range(2000))
    sk = read_orc_column(raw, "skewed")
    ss = read_orc_column(raw, "s")
    xs = read_orc_list_column(raw, "xs")
    dd = read_orc_column(raw, "d")
    for i, a in enumerate(order):
        r = by_a[a]
        assert sk[i] == r["skewed"]
        assert ss[i] == r["s"]
        assert xs[i] == (list(r["xs"]) if r["xs"] is not None else None)
        assert dd[i] == r["d"]


def test_map_column_roundtrip_all_codecs():
    import io

    import pyarrow as pa
    import pytest as _pytest
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import OrcError, read_orc_map_column

    md = [{"a": 1, "b": 2}, None, {}, {"c": None, "d": 4}, {"e": 5}]
    t = pa.table({"m": pa.array(md, type=pa.map_(pa.string(), pa.int64()))})
    for comp in ("UNCOMPRESSED", "ZLIB", "ZSTD", "SNAPPY"):
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=comp)
        assert read_orc_map_column(buf.getvalue(), "m") == md, comp
    with _pytest.raises(OrcError, match="not a map"):
        t2 = pa.table({"a": pa.array([1])})
        buf2 = io.BytesIO()
        pa_orc.write_table(t2, buf2)
        read_orc_map_column(buf2.getvalue(), "a")


def test_struct_fields_read_by_dotted_path():
    """ORC struct fields by dotted path: each struct level's PRESENT
    stream compresses the child's slot count, and the read expands
    back out — None whether the field or any enclosing struct is
    null, incl. a two-level struct chain."""
    import io

    import pyarrow as pa
    import pytest as _pytest
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import OrcError, read_orc_column

    rows = [
        {"lang": "en", "score": 3},
        None,
        {"lang": None, "score": 7},
        {"lang": "de", "score": None},
        None,
    ]
    t = pa.table(
        {
            "id": pa.array(range(5), type=pa.int64()),
            "meta": pa.array(
                rows,
                type=pa.struct(
                    [("lang", pa.string()), ("score", pa.int64())]
                ),
            ),
        }
    )
    for comp in ("UNCOMPRESSED", "ZLIB", "ZSTD"):
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=comp)
        raw = buf.getvalue()
        assert read_orc_column(raw, "meta.lang") == [
            "en", None, None, "de", None,
        ]
        assert read_orc_column(raw, "meta.score") == [3, None, 7, None, None]
    rows2 = [{"inner": {"x": 1}}, {"inner": None}, None]
    t2 = pa.table(
        {
            "outer": pa.array(
                rows2,
                type=pa.struct(
                    [("inner", pa.struct([("x", pa.int64())]))]
                ),
            )
        }
    )
    buf = io.BytesIO()
    pa_orc.write_table(t2, buf)
    assert read_orc_column(buf.getvalue(), "outer.inner.x") == [1, None, None]
    with _pytest.raises(OrcError, match="is a struct"):
        read_orc_column(buf.getvalue(), "outer")
    with _pytest.raises(OrcError, match="no field"):
        read_orc_column(buf.getvalue(), "outer.nope")


def test_row_index_walk_and_rowgroup_pruning():
    """The parquet page-index twin: per-10k-row-group positions and
    min/max from the stripe INDEX region alone, with pruning
    verdicts — exact group bounds on a sorted column across codecs
    and a multi-stripe file covering every row exactly once."""
    import io

    import pyarrow as pa
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import (
        orc_row_index,
        orc_rowgroup_prune,
    )

    t = pa.table({"v": pa.array(range(25000), type=pa.int64())})
    for comp in ("UNCOMPRESSED", "ZLIB", "ZSTD"):
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=comp)
        raw = buf.getvalue()
        idx = orc_row_index(raw, "v")
        assert [
            (e["rg_idx"], e["row_start"], e["n_rows"], e["min"], e["max"])
            for e in idx
        ] == [
            (0, 0, 10000, 0, 9999),
            (1, 10000, 10000, 10000, 19999),
            (2, 20000, 5000, 20000, 24999),
        ], comp
        assert [
            e["may_match"]
            for e in orc_rowgroup_prune(raw, "v", "=", 15000)
        ] == [False, True, False]
        assert [
            e["may_match"]
            for e in orc_rowgroup_prune(raw, "v", "<", 5)
        ] == [True, False, False]
    buf = io.BytesIO()
    pa_orc.write_table(t, buf, stripe_size=64 * 1024)
    idx = orc_row_index(buf.getvalue(), "v")
    assert len({e["stripe_idx"] for e in idx}) > 1
    assert sum(e["n_rows"] for e in idx) == 25000


# ------------------------------------------- deep nesting (r11)
def test_struct_in_list_and_deep_composites():
    """list<struct>, list<list>, map<string,list> — the recursive
    _stripe_value tier, pinned against pyarrow across codecs and a
    multi-stripe split."""
    import io

    import pyarrow as pa
    from pyarrow import orc as pa_orc

    from core_spark.functions.orcfile import (
        read_orc_list_column,
        read_orc_map_column,
    )

    rows = [
        [{"x": 1, "y": "a"}, {"x": None, "y": "b"}],
        None,
        [],
        [None, {"x": 3, "y": None}],
    ]
    typ = pa.list_(pa.struct([("x", pa.int64()), ("y", pa.string())]))
    t = pa.table({"ev": pa.array(rows, type=typ)})
    for comp in ("UNCOMPRESSED", "ZLIB", "ZSTD"):
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=comp)
        assert read_orc_list_column(buf.getvalue(), "ev") == rows, comp

    md = [
        [("k1", [1, None]), ("k2", [])],
        None,
        [],
        [("k3", None)],
    ]
    t2 = pa.table(
        {"m": pa.array(md, type=pa.map_(pa.string(), pa.list_(pa.int64())))}
    )
    buf = io.BytesIO()
    pa_orc.write_table(t2, buf)
    want = [None if r is None else dict(r) for r in md]
    assert read_orc_map_column(buf.getvalue(), "m") == want

    # multi-stripe list<struct<pts: list<long>>>
    big = [
        None
        if i % 11 == 0
        else [
            {"pts": None if (i + j) % 7 == 0 else list(range(j % 3))}
            for j in range(i % 4)
        ]
        for i in range(4000)
    ]
    typ = pa.list_(pa.struct([("pts", pa.list_(pa.int64()))]))
    t3 = pa.table({"seg": pa.array(big, type=typ)})
    buf = io.BytesIO()
    pa_orc.write_table(t3, buf, stripe_size=64 * 1024)
    from core_spark.functions.orcfile import parse_orc_tail

    raw = buf.getvalue()
    assert len(parse_orc_tail(raw)["stripes"]) > 1
    assert read_orc_list_column(raw, "seg") == big


def test_nested_reader_against_spark_java_orc_writer(spark, tmp_path):
    """Interop with the Java ORC encoder: array<struct<x,y>> and
    array<array<double>> written by Spark reassemble to what Spark
    itself reads back."""
    import glob

    from pyspark.sql import Row

    from core_spark.functions.orcfile import (
        read_orc_column,
        read_orc_list_column,
    )

    rows = [
        Row(id=0, m=[[1.5, None], []], ev=[Row(x=1, y="a"), None]),
        Row(id=1, m=None, ev=None),
        Row(id=2, m=[], ev=[]),
        Row(id=3, m=[None, [2.25]], ev=[Row(x=None, y="c")]),
    ]
    df = spark.createDataFrame(
        rows, "id int, m array<array<double>>, ev array<struct<x:int,y:string>>"
    )
    out = str(tmp_path / "nested_orc")
    df.coalesce(1).write.mode("overwrite").orc(out)
    (path,) = glob.glob(out + "/*.orc")
    raw = open(path, "rb").read()
    back = {r["id"]: r for r in spark.read.orc(out).collect()}
    ids = read_orc_column(raw, "id")
    ms = read_orc_list_column(raw, "m")
    evs = read_orc_list_column(raw, "ev")
    for k, rid in enumerate(ids):
        want = back[rid]
        assert ms[k] == want["m"]
        wev = (
            None
            if want["ev"] is None
            else [None if e is None else e.asDict() for e in want["ev"]]
        )
        assert evs[k] == wev


def test_timestamp_writer_timezone_wall_clock(monkeypatch):
    """A non-UTC writerTimezone anchors the base epoch AND renders
    wall clock in that zone: a 2020-06-01 12:00 wall-clock written
    in America/Los_Angeles must read back as the same wall clock
    (self-consistency check — no independent non-UTC encoder exists
    in this environment; the math is from the ORC spec's
    writer-timezone contract). Unknown zones raise the named error,
    never a silently shifted value."""
    import datetime as dt
    import io
    from zoneinfo import ZoneInfo

    from core_spark.functions import orcfile as of

    tz = ZoneInfo("America/Los_Angeles")
    wall = dt.datetime(2020, 6, 1, 12, 0, 0, 250000)  # PDT (-7)
    wall2 = dt.datetime(2020, 1, 15, 8, 30)           # PST (-8): DST flip
    # serialize AS a Los_Angeles writer would: seconds relative to
    # the base wall clock, both interpreted in the writer zone
    base = dt.datetime(2015, 1, 1, tzinfo=tz).timestamp()
    stored = [
        int(wall.replace(tzinfo=tz).timestamp() - base),
        int(wall2.replace(tzinfo=tz).timestamp() - base),
    ]
    # write a GMT file with those stored seconds via pyarrow (same
    # wire bytes), then present it as a Los_Angeles file
    utc_vals = [
        dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s + 1420070400,
                                               microseconds=250000 * (i == 0))
        for i, s in enumerate(stored)
    ]
    t = pa.table({"ts": pa.array(utc_vals, type=pa.timestamp("us"))})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="UNCOMPRESSED")
    monkeypatch.setattr(
        of, "_stripe_writer_timezone",
        lambda raw, stripe, comp: "America/Los_Angeles",
    )
    got = [_ns_to_dt(n) for n in of.read_orc_column(buf.getvalue(), "ts")]
    assert got == [wall, wall2]

    monkeypatch.setattr(
        of, "_stripe_writer_timezone",
        lambda raw, stripe, comp: "Not/AZone",
    )
    with pytest.raises(OrcError, match="Not/AZone"):
        of.read_orc_column(buf.getvalue(), "ts")


def test_list_and_map_under_structs_by_dotted_path():
    """r11: read_orc_list_column / read_orc_map_column accept dotted
    paths through non-repeated structs (meta.tags), flattened-null
    convention — the parquet dotted-path parity."""
    import pyarrow as pa

    from core_spark.functions.orcfile import (
        read_orc_list_column,
        read_orc_map_column,
    )

    rows = [
        {"tags": ["a", None], "m": [("k", 1)]},
        None,
        {"tags": None, "m": None},
        {"tags": [], "m": []},
        {"tags": ["b"], "m": [("x", None), ("y", 2)]},
    ]
    typ = pa.struct([
        ("tags", pa.list_(pa.string())),
        ("m", pa.map_(pa.string(), pa.int64())),
    ])
    t = pa.table({"meta": pa.array(rows, type=typ)})
    buf = io.BytesIO()
    orc.write_table(t, buf)
    raw = buf.getvalue()
    assert read_orc_list_column(raw, "meta.tags") == [
        ["a", None], None, None, [], ["b"]
    ]
    assert read_orc_map_column(raw, "meta.m") == [
        {"k": 1}, None, None, {}, {"x": None, "y": 2}
    ]
    with pytest.raises(OrcError, match="not a list"):
        read_orc_list_column(raw, "meta.m")


# ------------------------------------------------- bloom streams (r11)
def test_orc_bloom_probe_pins_against_spark_java_writer(spark, tmp_path):
    """BLOOM_FILTER_UTF8 streams written by Spark's Java ORC writer
    (orc.bloom.filter.columns) probed by the from-spec reader: every
    present value True in its stripe (soundness — incl. id 0 and
    negatives, the signed-shift long-hash edge the unsigned port
    gets wrong), absent values overwhelmingly False, strings through
    Murmur3-64, doubles through their IEEE bits, multi-stripe and
    multi-row-group granularity."""
    import glob

    from core_spark.functions.orcfile import (
        orc_bloom_filters,
        orc_bloom_may_contain,
    )

    out = str(tmp_path / "ob")
    (
        spark.range(0, 30000)
        .selectExpr(
            "id - 15000 AS id",  # negatives AND zero through the mix
            "CAST(id AS DOUBLE) * 0.25 AS d",
            "concat('u', CAST(id * 2654435761 % 1000000007 AS STRING)) AS name",
        )
        .coalesce(1)
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .option("orc.bloom.filter.columns", "id,d,name")
        .option("orc.bloom.filter.fpp", "0.01")
        .option("orc.stripe.size", "65536")  # multiple stripes
        .option("orc.row.index.stride", "5000")  # multiple row groups
        .orc(out)
    )
    (path,) = glob.glob(out + "/*.orc")
    raw = open(path, "rb").read()

    from core_spark.functions.orcfile import parse_orc_tail

    tail = parse_orc_tail(raw)
    n_stripes = len(tail["stripes"])
    assert n_stripes > 1
    filters = orc_bloom_filters(raw, "id")
    assert len(filters) == n_stripes and all(len(f) >= 1 for f in filters)

    # soundness: every present value verdicts True SOMEWHERE (and
    # 0/negative keys exercise the signed-shift path)
    for v in (-15000, -1, 0, 1, 7777, 14999):
        vd = orc_bloom_may_contain(raw, "id", v)
        assert any(x for s in vd for x in s), v
        dd = orc_bloom_may_contain(raw, "d", (v + 15000) * 0.25)
        assert any(x for s in dd for x in s), v
        nm = orc_bloom_may_contain(
            raw, "name", f"u{(v + 15000) * 2654435761 % 1000000007}"
        )
        assert any(x for s in nm for x in s), v

    # sorted ids: a value must be False in every stripe but its own
    v0 = orc_bloom_may_contain(raw, "id", -15000)
    assert v0[0][0] is True
    assert not any(x for s in v0[1:] for x in s)

    # absent values: each ~1%-fpp row group is overwhelmingly False;
    # with many row groups the per-VALUE all-False rate compounds to
    # ~1 - n_rg/100, so bound the per-row-group rate tightly and the
    # per-value rate loosely
    verdicts = [
        [x for s in orc_bloom_may_contain(raw, "id", v) for x in s]
        for v in range(400000, 400200)
    ]
    n_rg_probes = sum(len(v) for v in verdicts)
    n_rg_false = sum(sum(1 for x in v if not x) for v in verdicts)
    assert n_rg_false >= 0.97 * n_rg_probes, (n_rg_false, n_rg_probes)
    n_all_false = sum(1 for v in verdicts if not any(v))
    assert n_all_false >= 170, n_all_false


def test_orc_bloom_long_hash_matches_jvm_fingerprints(spark):
    """orc_long_hash and the probe-position math pinned per-value
    against the ACTUAL JVM BloomFilterUtf8 (single-value filters:
    the set-bit fingerprint IS the position list)."""
    from core_spark.functions.orcfile import _orc_bloom_test, orc_long_hash

    jvm = spark._jvm
    Lv = jvm.java.lang.Long.valueOf
    for v in (0, 1, -1, -5, 7, 0x123456789, -(2**40), 2**62):
        bf = jvm.org.apache.orc.util.BloomFilterUtf8(1000, 0.01)
        bf.addLong(Lv(str(v)))
        longs = list(bf.getBitSet())
        bits = b"".join(
            (w & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little") for w in longs
        )
        mine = {"k": bf.getNumHashFunctions(), "bits": bits}
        assert _orc_bloom_test(mine, orc_long_hash(v)), v
        # and a differently-hashed value must not trivially pass
        assert not _orc_bloom_test(mine, orc_long_hash(v + 12345)), v


def test_rlev1_pins_against_spark_011_writer(spark, tmp_path):
    """Pre-HIVE-4123 files (orc.write.format=0.11 — Spark's Java
    writer emits genuine RLE v1 streams, encoding kinds 0/1) decode
    end to end: integers with run/literal/delta mixes, direct AND
    dictionary strings, dates, decimals with v1 scale streams,
    timestamps, list lengths — all value-exact against what Spark
    itself reads back."""
    import datetime as dt
    import glob
    import random
    from decimal import Decimal

    from pyspark.sql import Row

    from core_spark.functions.orcfile import (
        read_orc_column,
        read_orc_list_column,
    )

    rng = random.Random(0x011)
    rows = []
    for k in range(3000):
        shape = k % 5
        v = (
            k if shape == 0                      # +1 runs
            else 7 if shape == 1                 # repeats
            else rng.randrange(-10**9, 10**9) if shape == 2   # literals
            else 1000 - k * 3 if shape == 3      # negative delta runs
            else -k
        )
        rows.append(Row(
            id=k,
            v=v,
            s=f"dict{k % 13}",                   # dictionary-friendly
            u=f"uniq-{k}-{rng.randrange(10**6)}",  # direct strings
            d=dt.date(2000 + k % 40, 1 + k % 12, 1 + k % 28),
            dec=Decimal(rng.randrange(-10**10, 10**10)).scaleb(-2),
            ts=dt.datetime(1990, 1, 1)
            + dt.timedelta(seconds=k * 977, microseconds=k % 1000),
            xs=list(range(k % 4)),
        ))
    df = spark.createDataFrame(
        rows,
        "id long, v long, s string, u string, d date,"
        " dec decimal(12,2), ts timestamp, xs array<long>",
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        out = str(tmp_path / "v011")
        (df.coalesce(1).sortWithinPartitions("id")
         .write.mode("overwrite")
         .option("orc.write.format", "0.11").orc(out))
        (path,) = glob.glob(out + "/*.orc")
        raw = open(path, "rb").read()
        back = {r["id"]: r for r in spark.read.orc(out).collect()}

        ids = read_orc_column(raw, "id")
        assert sorted(ids) == list(range(3000))
        cols = {
            "v": read_orc_column(raw, "v"),
            "s": read_orc_column(raw, "s"),
            "u": read_orc_column(raw, "u"),
            "d": read_orc_column(raw, "d"),
            "dec": read_orc_column(raw, "dec"),
            "ts": read_orc_column(raw, "ts"),
            "xs": read_orc_list_column(raw, "xs"),
        }
        for i, rid in enumerate(ids):
            want = back[rid]
            assert cols["v"][i] == want["v"]
            assert cols["s"][i] == want["s"]
            assert cols["u"][i] == want["u"]
            assert cols["d"][i] == (want["d"] - dt.date(1970, 1, 1)).days
            assert cols["dec"][i] == want["dec"]
            assert _ns_to_dt(cols["ts"][i]) == want["ts"]
            assert cols["xs"][i] == want["xs"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_union_columns_decode(spark=None):
    """ORC UNION columns (DIRECT encoding: byte-RLE tags + per-branch
    children) — with nulls, inside lists, multi-stripe — pinned
    against pyarrow's writer and reader."""
    import random

    import pyarrow as pa

    from core_spark.functions.orcfile import (
        OrcError,
        parse_orc_tail,
        read_orc_column,
        read_orc_list_column,
    )

    def u(tags, children):
        return pa.UnionArray.from_sparse(
            pa.array(tags, type=pa.int8()), children
        )

    arr = u([0, 1, 0, 1], [pa.array([1, 2, 3, 4]),
                           pa.array(["a", "b", "c", "d"])])
    buf = io.BytesIO()
    orc.write_table(pa.table({"v": arr}), buf)
    raw = buf.getvalue()
    want = orc.ORCFile(io.BytesIO(raw)).read().column("v").to_pylist()
    assert read_orc_column(raw, "v") == want == [1, "b", 3, "d"]

    # big + random tags, multi-stripe, three branches
    rng = random.Random(0xDEAD)
    n = 20000
    tags = [rng.randrange(3) for _ in range(n)]
    kids = [
        pa.array([rng.randrange(-(10**6), 10**6) for _ in range(n)]),
        pa.array([f"s{k % 97}" for k in range(n)]),
        pa.array([k * 0.25 for k in range(n)]),
    ]
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"v": u(tags, kids)}), buf, stripe_size=64 * 1024
    )
    raw = buf.getvalue()
    assert len(parse_orc_tail(raw)["stripes"]) > 1
    want = orc.ORCFile(io.BytesIO(raw)).read().column("v").to_pylist()
    assert read_orc_column(raw, "v") == want

    # union elements inside a list
    la = pa.ListArray.from_arrays(
        pa.array([0, 2, 2, 4]),
        u([0, 1, 1, 0], [pa.array([7, 8, 9, 10]),
                         pa.array(["x", "y", "z", "w"])]),
    )
    buf = io.BytesIO()
    orc.write_table(pa.table({"xs": la}), buf)
    raw = buf.getvalue()
    # NOTE: pyarrow's own READER loses union values behind non-zero
    # list offsets (reads [None, None] for the third list) — pin
    # against the constructed truth the writer serialized instead
    assert read_orc_list_column(raw, "xs") == [[7, "y"], [], ["z", 10]]

    # a corrupt out-of-range tag raises the named error
    buf = io.BytesIO()
    orc.write_table(
        pa.table({"v": u([0, 1], [pa.array([1, 2]),
                                  pa.array(["a", "b"])])}),
        buf, compression="UNCOMPRESSED",
    )
    evil = bytearray(buf.getvalue())
    # locate the 2-slot tag stream (byte-RLE literal [0,1]) and bump
    tail = parse_orc_tail(bytes(evil))
    ok = False
    for off in range(tail["stripes"][0]["offset"],
                     tail["stripes"][0]["offset"]
                     + tail["stripes"][0]["data_len"] + 40):
        if evil[off:off+3] == bytes([0xFE, 0x00, 0x01]):
            evil[off+2] = 9  # tag 9 of 2 branches
            ok = True
            break
    if ok:
        with pytest.raises(OrcError, match="tag"):
            read_orc_column(bytes(evil), "v")


def test_rlev1_property_fuzz_against_test_encoder():
    """Property fuzz: random run/literal mixes through a test-side
    RLE v1 ENCODER (written from the spec independently of the
    decoder) must round-trip exactly — both signednesses, delta
    edges (-128/127), long runs (130), singleton literal groups."""
    import random

    from core_spark.functions.orcfile import _rlev1

    def zigzag(n):
        return (n << 1) ^ (n >> 63) if n < 0 else n << 1

    def varint(u):
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            out.append(b | (0x80 if u else 0))
            if not u:
                return bytes(out)

    rng = random.Random(0x9E1)
    for trial in range(120):
        signed = trial % 2 == 0
        buf = bytearray()
        want: list[int] = []
        for _ in range(rng.randrange(1, 12)):
            if rng.random() < 0.5:
                run = rng.choice([3, 4, 7, 50, 130])
                delta = rng.choice([-128, -3, 0, 1, 5, 127])
                base = (
                    rng.randrange(-(10**9), 10**9)
                    if signed
                    else rng.randrange(0, 10**9)
                )
                buf.append(run - 3)
                buf.append(delta & 0xFF)
                buf += varint(zigzag(base) if signed else base)
                want.extend(base + k * delta for k in range(run))
            else:
                lits = [
                    rng.randrange(-(10**12), 10**12)
                    if signed
                    else rng.randrange(0, 10**12)
                    for _ in range(rng.randrange(1, 128))
                ]
                buf.append(256 - len(lits))
                for v in lits:
                    buf += varint(zigzag(v) if signed else v)
                want.extend(lits)
        assert _rlev1(bytes(buf), signed=signed) == want, trial


def test_orc_stripe_stats_verify_multi_stripe_and_tamper():
    """orc_verify_stripe_stats (r13): per-stripe StripeStatistics
    from the Metadata section match a from-spec recompute of the
    decoded values (int with planted nulls + string columns, genuine
    multi-stripe file), the stripes roll up to the footer's
    file-level stats — and EVERY single-byte flip across the
    Metadata section raises OrcError (either a parse fence or a
    stats-disagree fence), never a silently-accepted wrong
    statistic."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from core_spark.functions.orcfile import (
        OrcError,
        _parse_postscript,
        orc_verify_stripe_stats,
        parse_orc_metadata,
    )

    import hashlib

    n = 1200
    hs = [hashlib.md5(b"stats:%d" % k).hexdigest() for k in range(n)]
    t = pa.table(
        {
            "score": pa.array(
                [None if k % 5 == 0 else int(h[:12], 16)
                 for k, h in enumerate(hs)],
                pa.int64(),
            ),
            "word": pa.array([h[:8] for h in hs], pa.string()),
        }
    )
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression="uncompressed", stripe_size=1024,
        batch_size=64,
    )
    raw = buf.getvalue()

    sc = orc_verify_stripe_stats(raw, "score")
    wd = orc_verify_stripe_stats(raw, "word")
    assert len(sc) >= 2 and len(wd) >= 2  # genuinely multi-stripe
    assert sum(r["n_rows"] for r in sc) == n
    assert all(r["has_null"] for r in sc)
    assert not any(r["has_null"] for r in wd)
    present = [v for v in t["score"].to_pylist() if v is not None]
    assert sum(r["sum"] for r in sc) == sum(present)
    assert min(r["min"] for r in wd) == min(h[:8] for h in hs)

    # tamper sweep: every byte of the Metadata section is live
    ps_len = raw[-1]
    ps = _parse_postscript(raw[len(raw) - 1 - ps_len : len(raw) - 1])
    foot_end = len(raw) - 1 - ps_len - ps["footer_len"]
    m0 = foot_end - ps["metadata_len"]
    assert ps["metadata_len"] > 0
    flips_ok = 0
    for at in range(m0, foot_end):
        evil = bytearray(raw)
        evil[at] ^= 0xFF
        try:
            orc_verify_stripe_stats(bytes(evil), "score")
            orc_verify_stripe_stats(bytes(evil), "word")
        except OrcError:
            flips_ok += 1
        except Exception as e:  # noqa: BLE001 - the assertion below names it
            raise AssertionError(
                f"flip at {at - m0} escaped the named-error contract: "
                f"{type(e).__name__}: {e}"
            ) from e
        else:
            raise AssertionError(
                f"flip at {at - m0} accepted: a corrupted statistic "
                "verified clean"
            )
    assert flips_ok == ps["metadata_len"]

    # no-metadata fence: strip the metadata by zeroing its length is
    # not possible without rewriting the postscript; instead verify
    # the named error on a file pyarrow writes with no stripes
    empty = io.BytesIO()
    orc.write_table(pa.table({"x": pa.array([], pa.int64())}), empty)
    with pytest.raises(OrcError):
        orc_verify_stripe_stats(empty.getvalue(), "x")

    # unsupported-kind fence
    buf2 = io.BytesIO()
    orc.write_table(
        pa.table({"d": pa.array([1.5, 2.5], pa.float64())}), buf2
    )
    with pytest.raises(OrcError, match="kind"):
        orc_verify_stripe_stats(buf2.getvalue(), "d")

    # metadata parses double stats even though verify fences them
    md = parse_orc_metadata(buf2.getvalue())
    assert md and md[0][1]["double"] == {"min": 1.5, "max": 2.5, "sum": 4.0}


def test_orc_stripe_stats_pin_against_spark_java_writer(spark, tmp_path):
    """The stats verifier against the OTHER independent producer:
    Spark's Java orc-core writer (multi-stripe via orc.stripe.size),
    int, string and nullable columns — recorded stripe stats match
    the from-spec recompute bit-exactly, including the sum and
    UTF-8-byte string totals."""
    import glob

    from core_spark.functions.orcfile import (
        orc_verify_stripe_stats,
        parse_orc_tail,
    )

    out = str(tmp_path / "ostats")
    (
        spark.range(0, 60000)
        .selectExpr(
            "id - 30000 AS id",  # negatives through the sint64 zigzag
            "concat('v', CAST(id * 2654435761 % 1000000007 AS STRING))"
            " AS name",
            "CASE WHEN id % 7 = 0 THEN NULL ELSE id * 3 END AS score",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("orc.stripe.size", "65536")
        .option("orc.compress", "ZSTD")
        .orc(out)
    )
    (path,) = glob.glob(out + "/*.orc")
    raw = open(path, "rb").read()
    assert len(parse_orc_tail(raw)["stripes"]) > 1
    for col in ("id", "name", "score"):
        rows = orc_verify_stripe_stats(raw, col)
        assert len(rows) > 1
    assert sum(r["n_rows"] for r in rows) == 60000
    assert sum(1 for r in rows if r["has_null"])


def test_orc_rowindex_stats_verify_and_spark_pin(spark, tmp_path):
    """orc_verify_rowindex_stats (r13): every RowIndexEntry's
    recorded n_values/min/max recomputed from the decoded values at
    the entry's own (stripe, row_start, n_rows) coordinates — the
    exact statistics orc_rowgroup_prune trusts — against BOTH
    independent writers; a recorded-stat byte flip in the index
    region is caught."""
    import glob
    import hashlib
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from core_spark.functions.orcfile import (
        OrcError,
        orc_verify_rowindex_stats,
    )

    n = 30_000
    hs = [hashlib.md5(b"ri:%d" % k).hexdigest() for k in range(n)]
    t = pa.table(
        {
            "v": pa.array(
                [
                    None if k % 5 == 0 else int(h[:12], 16) - (1 << 46)
                    for k, h in enumerate(hs)
                ],
                pa.int64(),
            )
        }
    )
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression="uncompressed", stripe_size=65536,
        row_index_stride=1000, batch_size=512,
    )
    raw = buf.getvalue()
    entries = orc_verify_rowindex_stats(raw, "v")
    assert len(entries) > 30 and len({e["stripe_idx"] for e in entries}) > 5
    assert sum(e["n_rows"] for e in entries) == n

    # Spark's Java orc-core writer, negatives + nulls
    out = str(tmp_path / "ori")
    (
        spark.range(0, 60000)
        .selectExpr(
            "CASE WHEN id % 7 = 0 THEN NULL ELSE id * 3 - 90000 END AS s"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("orc.stripe.size", "65536")
        .option("orc.row.index.stride", "2000")
        .orc(out)
    )
    (path,) = glob.glob(out + "/*.orc")
    jraw = open(path, "rb").read()
    jentries = orc_verify_rowindex_stats(jraw, "s")
    assert sum(e["n_rows"] for e in jentries) == 60000
    # the Java writer's memory-based flush keeps this file to one
    # stripe; row-GROUP granularity (the surface under test) is
    # still dense — the pyarrow file above covers multi-stripe
    assert len(jentries) >= 30

    # tamper sweep over stripe 0's uncompressed INDEX region: every
    # flip landing on a recorded STATISTIC is caught (stats-disagree
    # or a parse fence); flips on stream-seek POSITIONS are outside
    # this verifier's scope, so the expected catch rate is the
    # stats' share of the entry bytes — assert a robust floor
    from core_spark.functions.orcfile import parse_orc_tail

    tail = parse_orc_tail(raw)
    st = tail["stripes"][0]
    idx0, idx1 = st["offset"], st["offset"] + st["index_len"]
    caught = total = 0
    for at in range(idx0, idx1, 3):
        evil = bytearray(raw)
        evil[at] ^= 0x40
        total += 1
        try:
            orc_verify_rowindex_stats(bytes(evil), "v")
        except (OrcError, ValueError):
            caught += 1
    assert total >= 30 and caught >= total * 0.4, (caught, total)
