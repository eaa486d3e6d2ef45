"""The three reference example apps, end-to-end on the engine."""

import hashlib
import os

from pyspark.sql import functions as F

from core_spark.examples.bike_share import (
    bike_history,
    detect_cycles,
    ingest_rides,
    recent_rides,
)
from core_spark.examples.stream_sum import run_and_verify
from core_spark.examples.word_count import query_prefix, run_word_count


def test_word_count_end_to_end(spark, tmp_path):
    src = str(tmp_path / "sentences")
    os.makedirs(src)
    spark.createDataFrame(
        [("the quick brown fox",), ("the quick red fox",), ("a lazy dog",)],
        "sentence string",
    ).coalesce(1).write.parquet(os.path.join(src, "s0.parquet"))

    run_word_count(
        spark, src + "/*", str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    got = {
        (r.ngram, r.cnt)
        for r in query_prefix(spark, str(tmp_path / "out"), "the ").collect()
    }
    assert got == {("the quick", 2)}


def test_stream_sum_self_verifies(spark):
    # passes with at-least-once duplicate delivery (exactly-once holds)
    run_and_verify(spark, n_streams=5, n_chunks=40, with_duplicates=True)


def test_bike_share_pipeline(spark):
    lines = [
        # bike 1: newest ride ends at 10; an older ride also ended at
        # 10 -> the newest-first walk revisits its origin (a cycle)
        (0, "1,2024-01-01 09:00:00,2024-01-01 09:10:00,9,10,600"),
        (1, "1,2024-01-01 10:00:00,2024-01-01 10:10:00,10,11,600"),
        (2, "1,2024-01-01 11:00:00,2024-01-01 11:10:00,11,12,600"),
        (3, "1,2024-01-01 12:00:00,2024-01-01 12:10:00,12,10,600"),
        # bike 2: no revisit
        (4, "2,2024-01-01 10:00:00,2024-01-01 10:20:00,5,6,1200"),
        (5, "2,2024-01-01 11:00:00,2024-01-01 11:20:00,6,7,1200"),
    ]
    csv_df = spark.createDataFrame(lines, "off long, line string")
    rides = ingest_rides(spark, csv_df)
    assert rides.filter(F.col("uuid").isNull()).count() == 0
    assert rides.select("bike_id", "start_station", "end_station").count() == 6

    assert recent_rides(rides, keep=2).groupBy("bike_id").count().filter(
        F.col("count") > 2
    ).count() == 0

    hist = bike_history(rides, 1).select("start_station").collect()
    assert [r.start_station for r in hist] == [9, 10, 11, 12]

    cyc = {r.bike_id: r.has_cycle for r in detect_cycles(spark, rides).collect()}
    assert cyc[1] == 1 and cyc[2] == 0


def test_curation_stream_end_to_end(spark, tmp_path):
    """The LLM-curation example: streamed chunks are scored, gated,
    deduplicated in-batch AND against the materialized corpus, and
    the clean journal serves per-language reads through its bloom
    index."""
    import os

    from core_spark.examples.curation_stream import (
        clean_read,
        corpus_stats,
        run_curation,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    good_en = "the quick brown fox jumps over the lazy dog"
    good_en2 = "a different sentence with the usual english words and form"
    short = "too short"
    rows0 = [(1, good_en), (2, short), (3, good_en)]  # 3 dups 1 in-batch
    rows1 = [(4, good_en), (5, good_en2)]  # 4 dups the corpus
    for name, rows in (("c0.parquet", rows0), ("c1.parquet", rows1)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, name))

    out = str(tmp_path / "out")
    run_curation(spark, src + "/*", out, str(tmp_path / "ckpt"))

    stats = {r.lang: (r.n_docs, r.n_tokens) for r in corpus_stats(spark, out).collect()}
    # kept: doc 1 (first of the dup set) and doc 5; doc 2 gated short,
    # doc 3 in-batch dup, doc 4 corpus dup
    assert sum(n for n, _t in stats.values()) == 2
    clean = clean_read(spark, out, "en")
    kept = sorted(r.doc_id for r in clean.collect())
    assert kept == [1, 5]
    assert set(clean.columns) >= {"doc_id", "text", "lang", "n_tokens", "h"}


def test_media_pipeline_end_to_end(spark, tmp_path):
    """media-pipeline: real-codec decode -> gates -> bloom-indexed
    journal -> per-format pruned serving. Payload mix exercises PNG,
    GIF, BMP, WAV (PCM + ulaw + IMA ADPCM), AIFF, FLAC and MP3 (the
    NULL-energy edge); a tiny image, a sub-second clip and a silent
    clip are rejected with named verdicts."""
    import struct

    import numpy as np

    from core_spark.examples.media_pipeline import (
        media_read,
        media_stats,
        run_media_curation,
    )
    from core_spark.multimodal import wav as W
    from core_spark.multimodal.bmp import bmp_encode
    from core_spark.multimodal.flac import flac_encode
    from core_spark.multimodal.gif import gif_encode
    from core_spark.multimodal.mp4 import build_fmp4, build_mp4
    from core_spark.multimodal.pdf import build_pdf_fixture
    from core_spark.multimodal.png import png_encode

    rng = np.random.default_rng(11)
    img = rng.integers(0, 5, (80, 120, 3), dtype=np.uint8) * 50
    tiny = img[:20, :20]
    tone = (
        9000 * np.sin(2 * np.pi * 440 * np.arange(16000) / 8000)
    ).astype(np.int64).reshape(-1, 1)
    silent = np.zeros((8000, 1), dtype=np.int64)
    short = tone[:800]
    ima, ba = W.ima_adpcm_encode(tone, 1, samples_per_block=505)

    payloads = [
        (1, png_encode(img)),                              # kept
        (2, gif_encode(img)),                              # kept
        (3, bmp_encode(img)),                              # kept
        (4, png_encode(tiny)),                             # rejected_small
        (5, W.build_wav(W.WAVE_PCM, 8000, 1, 16,
                        tone.astype("<i2").tobytes())),    # kept
        (6, W.build_wav(W.WAVE_ULAW, 8000, 1, 8,
                        W.ulaw_encode(tone[:, 0]),
                        block_align=1)),                   # kept
        (7, W.build_wav(W.WAVE_IMA_ADPCM, 8000, 1, 4, ima,
                        block_align=ba,
                        extra=struct.pack("<H", 505),
                        fact_frames=16000)),               # kept
        (8, W.build_wav(W.WAVE_PCM, 8000, 1, 16,
                        silent.astype("<i2").tobytes())),  # rejected_silent
        (9, W.build_wav(W.WAVE_PCM, 8000, 1, 16,
                        short.astype("<i2").tobytes())),   # rejected_short
        (10, W.build_aiff(8000, 1, 16, 16000,
                          tone.astype(">i2").tobytes())),  # kept
        (11, flac_encode(tone.astype(np.int32), 8000)),    # kept
        (12, b"".join(W.build_mp3_frame(kbps=128)
                      for _ in range(40))),                # kept_no_energy
        (13, build_mp4(4000, video=(1280, 720, "avc1"),
                       audio="mp4a")),                     # kept_no_energy
        (14, build_mp4(4000, video=(48, 32, "avc1"))),     # rejected_small
        (15, build_mp4(200, video=(640, 360, "hvc1"))),    # rejected_short
        (16, build_mp4(4000, audio="mp4a",
                       brand="M4A ")),                     # audio/mp4
        (17, build_mp4(4000, video=(1280, 720, "avc1"),
                       fragmented=True)),                  # kept_unverified
        # REAL fragmented movies (moof/trun): duration now comes from
        # summing trun sample durations, so the gate judges CMAF
        # content — long one kept, short one rejected (previously
        # both would have been unverified NULLs)
        (18, build_fmp4([[100] * 5] * 3, delta=40)),       # 600ms kept
        (19, build_fmp4([[100] * 4], delta=40)),           # 160ms short
        (20, build_mp4(700, audio="mp4a",
                       fragmented=True)),   # audio, unknown duration
        (21, build_pdf_fixture(
            "alpha bravo charlie delta echo foxtrot golf hotel",
            hashlib.md5(
                b"alpha bravo charlie delta echo foxtrot golf hotel"
            ).hexdigest())),                                # kept (text)
        (22, build_pdf_fixture(
            "india juliet kilo lima mike november oscar papa",
            hashlib.md5(
                b"india juliet kilo lima mike november oscar papa"
            ).hexdigest(),
            graphics_only=True)),           # rejected_no_text (scan-only)
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads],
        "doc_id long, payload binary",
    )
    out_root = str(tmp_path / "media")
    ledger = run_media_curation(spark, media, out_root)
    verdicts = {r.doc_id: r.verdict for r in ledger.collect()}
    assert verdicts[4] == "rejected_small"
    assert verdicts[8] == "rejected_silent"
    assert verdicts[9] == "rejected_short"
    assert verdicts[12] == "kept_no_energy"
    assert verdicts[13] == "kept_no_energy"  # mp4: box walk, no frame decode
    assert verdicts[14] == "rejected_small"
    assert verdicts[15] == "rejected_short"
    # audio-only ISO-BMFF routes by handler track, never "video" with
    # NULL dims slipping the dimension gate (r7 review regression)
    assert verdicts[16] == "kept_no_energy"
    # fragment-less fragmented shell (mvex, no moof): duration still
    # unknown -> explicitly unverified, not silently kept or falsely
    # rejected_short
    assert verdicts[17] == "kept_unverified"
    # real CMAF fragments: trun-summed duration drives the gate
    assert verdicts[18] == "kept_no_energy"
    assert verdicts[19] == "rejected_short"
    # fragmented AUDIO-only M4A: mvhd unknown and the fmp4 fallback
    # is video-gated, so duration stays NULL — must be flagged
    # unverified, not waved through the duration gate as an ordinary
    # keep (r7 review regression: the guard was video-scoped)
    assert verdicts[20] == "kept_unverified"
    # documents: text PDF kept, scan-only (graphics-only streams,
    # zero extractable chars) routed to OCR, not the text corpus
    assert verdicts[21] == "kept"
    assert verdicts[22] == "rejected_no_text"
    kept = {d for d, v in verdicts.items() if v.startswith("kept")}
    assert kept == {1, 2, 3, 5, 6, 7, 10, 11, 12, 13, 16, 17, 18, 20, 21}

    stats = {r.mime: r.n_assets for r in media_stats(spark, out_root).collect()}
    assert stats["image/png"] == 1 and stats["audio/wav"] == 3
    assert stats["audio/mpeg"] == 1
    assert stats["audio/mp4"] == 2 and stats["video/mp4"] == 3
    assert stats["application/pdf"] == 1

    wavs = media_read(spark, out_root, "audio/wav").collect()
    assert sorted(r.doc_id for r in wavs) == [5, 6, 7]
    # ADPCM/ulaw energy came from real decode, not container math
    assert all(r.mean_energy > _e for r in wavs for _e in [10])


def test_crawl_pipeline_end_to_end(spark):
    """The crawl-planning tier composed: messy discovery →
    canonical dedup → robots gate → per-host politeness schedule."""
    from core_spark.examples.crawl_pipeline import plan_crawl

    sf = "/root/testdata/sf0.001"
    plan = plan_crawl(spark, sf).toPandas()
    assert len(plan) > 0
    # the gate is structural: each host fences exactly one of its
    # two sitemap subtrees, so no host carries both
    import hashlib as _h

    per_host = plan.groupby("host")["url"].apply(
        lambda u: set(p.split("/")[-2] for p in u)
    )
    assert set().union(*per_host) == {"s0", "s1"}  # both survive somewhere
    for host, subtrees in per_host.items():
        fenced = f"s{int(_h.md5(host.encode()).hexdigest()[0], 16) % 2}"
        assert fenced not in subtrees and len(subtrees) == 1
    # canonicalization stripped the session junk and the fragment
    assert not plan["url"].str.contains("utm_source|#", regex=True).any()
    # frontier dedup: one row per canonical URL
    assert plan["url"].is_unique
    # politeness: within a host, fetch_at = (pos-1) * a constant
    # delay — monotone, evenly spaced
    for host, grp in plan.groupby("host"):
        grp = grp.sort_values("pos")
        assert list(grp["pos"]) == list(range(1, len(grp) + 1))
        diffs = grp["fetch_at_s"].diff().dropna().unique()
        assert len(diffs) <= 1  # constant per-host spacing
        assert grp["fetch_at_s"].iloc[0] == 0
    # freshest-first within each host (NULL lastmod sorts last)
    for host, grp in plan.groupby("host"):
        lm = grp.sort_values("pos")["lastmod"].tolist()
        non_null = [x for x in lm if x is not None]
        assert non_null == sorted(non_null, reverse=True)
        if None in lm:
            assert lm.index(None) >= len(non_null)
    # the lastmod-less url (sitemap child 1's last entry) survives on
    # hosts that fence /s0 — the NULL ordering branch is genuinely hit
    assert plan["lastmod"].isna().any()
