"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/transform plumbing."""

from core_spark.multimodal.columns import (
    attach_fmp4_payload,
    attach_pdf_payload,
    extract_pdf_pages,
    attach_vtt_payload,
    extract_captions,
    attach_mp3_payload,
    attach_mp4_payload,
    attach_mp4_stream_payload,
    attach_payload,
    decode_av_meta,
    plan_audio_fetch,
    plan_fragment_fetch,
    plan_video_fetch,
    decode_image_meta,
    resize_images,
    audio_frame_features,
    sample_audio_frames,
    sample_video_frames,
)

__all__ = [
    "attach_fmp4_payload",
    "attach_pdf_payload",
    "extract_pdf_pages",
    "attach_vtt_payload",
    "extract_captions",
    "attach_mp3_payload",
    "attach_mp4_payload",
    "attach_mp4_stream_payload",
    "attach_payload",
    "decode_av_meta",
    "plan_audio_fetch",
    "plan_fragment_fetch",
    "plan_video_fetch",
    "decode_image_meta",
    "resize_images",
    "audio_frame_features",
    "sample_audio_frames",
    "sample_video_frames",
]
