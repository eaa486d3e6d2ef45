"""ustar walk (functions/tar.py): offsets cross-checked against the
stdlib tarfile reader, data slices verified at the walked offsets,
checksum/truncation/junk inputs raise the named TarError."""

import hashlib
import io
import random
import tarfile

from core_spark.functions.tar import (
    TarError,
    build_webdataset_fixture,
    tar_members,
)

TEXT = "the fast key order sort table scan merge part window small hash"


def test_tar_walk_matches_stdlib_and_slices():
    dig = hashlib.md5(TEXT.encode()).hexdigest()
    blob = build_webdataset_fixture(TEXT, dig)
    members = tar_members(blob)

    # independent reader agreement: name, size, data offset
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    std = [(ti.name, ti.size, ti.offset_data) for ti in tf.getmembers()]
    assert std == [(m["name"], m["size"], m["data_off"]) for m in members]

    # slices at walked offsets are the real sample content
    words = TEXT.split(" ")
    nsamp = 2 + int(dig[0:2], 16) % 3
    assert len(members) == 2 * nsamp
    for i in range(nsamp):
        t, c = members[2 * i], members[2 * i + 1]
        assert t["name"] == f"{dig[:8]}-{i}.txt"
        got = blob[t["data_off"] : t["data_off"] + t["size"]].decode()
        exp = " ".join(
            words[(i * 8 + k) % len(words)] for k in range(8)
        )
        assert got == exp
        lab = blob[c["data_off"] : c["data_off"] + c["size"]].decode()
        assert lab == str((int(dig[0:2], 16) + i) % 10)

    # deterministic bytes (mtime/uid pinned)
    assert build_webdataset_fixture(TEXT, dig) == blob

    # the oracle's layout arithmetic: txt stride 2048, data at 512
    for i in range(nsamp):
        assert members[2 * i]["data_off"] == 512 + i * 2048


def test_tar_corrupt_inputs_raise_named():
    dig = hashlib.md5(TEXT.encode()).hexdigest()
    blob = build_webdataset_fixture(TEXT, dig)
    for junk in (
        b"x" * 512,                       # bad magic
        blob[:700],                       # truncated member data
        bytes([blob[0] ^ 1]) + blob[1:],  # checksum mismatch
        blob[:512],                       # header then EOF
    ):
        try:
            tar_members(junk)
            raise AssertionError(f"corrupt tar accepted: {junk[:8]!r}")
        except TarError:
            pass
    # fuzz: junk and bit-flips either parse or raise ValueError
    rnd = random.Random(9)
    for _ in range(800):
        junk = bytes(
            rnd.randrange(256) for _ in range(rnd.randrange(0, 1200))
        )
        try:
            tar_members(junk)
        except ValueError:
            pass
    for _ in range(800):
        b = bytearray(blob)
        b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        try:
            tar_members(bytes(b))
        except ValueError:
            pass


def test_tar_multiblock_member_offsets():
    """A sample whose text exceeds one 512-byte block shifts every
    subsequent member by whole blocks — the walked offsets (and the
    oracle's prefix-sum arithmetic) must track real padded sizes,
    not a fixed stride."""
    long_text = " ".join("w" * 80 for _ in range(16))  # 8 words > 512B
    dig = hashlib.md5(long_text.encode()).hexdigest()
    blob = build_webdataset_fixture(long_text, dig)
    members = tar_members(blob)
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(ti.name, ti.size, ti.offset_data) for ti in tf.getmembers()] \
        == [(m["name"], m["size"], m["data_off"]) for m in members]
    # txt members are 648 bytes -> padded to 1024: stride is 2560,
    # not the single-block 2048
    assert members[0]["size"] > 512
    stride = members[2]["data_off"] - members[0]["data_off"]
    assert stride == 512 + 1024 + 512 + 512
    # the oracle's prefix-sum form reproduces every txt offset
    off = 512
    for i in range(0, len(members), 2):
        assert members[i]["data_off"] == off
        t = members[i]["size"]
        off += 512 + ((t + 511) // 512) * 512 + 1024
