"""JPEG quality knob + DQT-walk estimator (multimodal/jpeg.py).

The codec round-trip suite lives in test_multimodal.py; this file
pins the r9 quality-scaling/estimation layer."""


def test_quality_knob_tables_and_estimator_inversion():
    """quality scales the Annex-K tables by the IJG mapping (Q50 is
    the tables verbatim — byte-compatible with the pre-knob encoder);
    the DQT-sum estimator inverts it within one step across 30-89."""
    import numpy as np

    from core_spark.multimodal.jpeg import (
        _QL,
        jpeg_decode,
        jpeg_encode,
        jpeg_quant_tables,
        quant_scale,
    )

    img = ((np.arange(256).reshape(16, 16) * 7) % 256).astype(np.uint8)
    assert jpeg_quant_tables(jpeg_encode(img))[0] == [int(v) for v in _QL]
    ksum = sum(int(v) for v in _QL)
    for q in range(30, 90):
        raw = jpeg_encode(img, quality=q)
        tab = jpeg_quant_tables(raw)[0]
        s = quant_scale(q)
        assert tab == [
            min(255, max(1, (int(k) * s + 50) // 100)) for k in _QL
        ]
        sm = (100000 * sum(tab)) // ksum
        est = (200000 - sm) // 2000 if sm <= 100000 else 5000000 // sm
        assert abs(est - q) <= 1, (q, est)
        # the file still decodes (decoder reads tables from the DQT)
        assert jpeg_decode(raw).shape == img.shape
