"""Structured return types — the reference's types.py dataclasses
(/root/reference/src/langchain_memvid/types.py:12-52) re-expressed
over REAL aggregates. The reference hard-codes several of these
numbers (SURVEY.md §4 defect 6); here every field derives from the
tables, so the dataclasses are honest views of measured state rather
than guesses.

``StorageStats`` itself lives in core/store.py (it predates this
module); its reference-named accessors below build on it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

_MB = 1024.0 * 1024.0


@dataclass
class FrameMappingStats:
    """≙ types.py:12-18. In this engine ``doc_id`` IS the frame key
    (SURVEY §1.1: ordering key = identity), so mapping coverage is a
    property of the id assignment, computed, not asserted."""

    total_documents: int
    mapped_documents: int
    mapping_coverage: float
    mapping_efficiency: dict[str, Any]


@dataclass
class VideoInfo:
    """≙ types.py:21-29 — one decoded container's header facts."""

    frame_count: int
    fps: float
    width: int
    height: int
    duration_seconds: float
    file_size_mb: float

    @classmethod
    def from_row(cls, row: Any) -> "VideoInfo":
        """Build from one ``decode_video_info`` output row
        (multimodal/binary.py decode_video_info: media_id,
        content_bytes, width, height, n_frames, fps, ...) — the
        bridge from the distributed header scan to the reference's
        per-file return shape.

        Salvage-mode decode_video_info rows (error IS NOT NULL) carry
        NULL info fields — they map to zeros here instead of the
        float(None) TypeError the two features used to compose into
        (ADVICE r7): a quarantined row still yields a well-formed
        "empty" VideoInfo the caller can inspect."""
        fps = float(row["fps"] or 0.0)
        n = int(row["n_frames"] or 0)
        return cls(
            frame_count=n,
            fps=fps,
            width=int(row["width"] or 0),
            height=int(row["height"] or 0),
            duration_seconds=(n / fps) if fps else 0.0,
            file_size_mb=int(row["content_bytes"] or 0) / _MB,
        )


@dataclass
class BuildStats:
    """≙ types.py:45-52 — one ingest batch's build record (the
    reference returns this from Encoder.build_video, whose written
    video holds ONLY the batch — so ``video_size_mb`` here is the
    BATCH's payload bytes, not the cumulative table;
    SparkVectorStore._ingest records it per add_texts/add_dataframe
    batch as ``last_build_stats``, and clear() resets it)."""

    total_chunks: int
    video_size_mb: float
    encoding_time: float
    index_path: str | None
    video_path: str | None
