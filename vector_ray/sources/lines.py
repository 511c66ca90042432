"""Raw-line ingestion: framing × parsing, mirroring the reference's
codec factoring (src/codecs/framers/*: newline-delimited,
character-delimited, length-delimited, octet-counting) as Ray Data
sources producing a ``line: string`` dataset that feeds the existing
parser stages (grok / regex / syslog / logfmt / apache ...).

- ``newline`` framing maps to ``ray.data.read_text`` (splittable,
  streams at scale).
- ``character`` / ``length`` / ``octet`` framings are inherently
  sequential WITHIN a file (frame boundaries depend on prior frames),
  so they decode per file via ``read_binary_files`` + flat_map — the
  parallel unit is the file, the right granularity for these formats
  (matches the reference, which frames per connection/file stream).
"""

from __future__ import annotations

import struct

import pyarrow as pa

import ray.data as rd


def _frames_character(payload: bytes, delimiter: bytes) -> list[bytes]:
    frames = payload.split(delimiter)
    # a trailing delimiter yields one empty tail frame — drop it, like
    # the reference's framer, which only emits on delimiter hit
    if frames and frames[-1] == b"":
        frames.pop()
    return frames


def _frames_length(payload: bytes) -> list[bytes]:
    """u32 big-endian length-prefixed frames
    (src/codecs/framers/length_delimited.rs)."""
    out = []
    pos, n = 0, len(payload)
    while pos + 4 <= n:
        (ln,) = struct.unpack_from(">I", payload, pos)
        pos += 4
        if pos + ln > n:
            raise ValueError(f"truncated length-delimited frame at byte {pos - 4}")
        out.append(payload[pos : pos + ln])
        pos += ln
    if pos != n:
        raise ValueError(f"trailing {n - pos} bytes after last frame")
    return out


def _frames_octet(payload: bytes) -> list[bytes]:
    """RFC 6587 octet counting: '<len> <msg>' frames
    (src/codecs/framers/octet_counting.rs)."""
    out = []
    pos, n = 0, len(payload)
    while pos < n:
        sp = payload.index(b" ", pos)
        ln = int(payload[pos:sp])
        start = sp + 1
        if start + ln > n:
            raise ValueError(f"truncated octet-counted frame at byte {pos}")
        out.append(payload[start : start + ln])
        pos = start + ln
    return out


def read_lines(
    paths,
    *,
    framing: str = "newline",
    delimiter: bytes = b"\n",
    encoding: str = "utf-8",
    compression: str = "auto",
    **read_kwargs,
):
    """Dataset with a single ``line: string`` column, framed per the
    reference's framer configs. ``compression``: "auto" (default)
    gunzips files ending in .gz, "gzip" forces it, "none" disables —
    the decode half of the FileSink gzip roundtrip (the reference's
    file source `compression` option)."""
    if compression not in ("auto", "gzip", "none"):
        raise ValueError("compression must be auto|gzip|none")
    if framing == "newline":
        # read_text can't sniff gzip: route gzip inputs through the
        # binary path and split on the delimiter after decompression
        force_gz = compression == "gzip" or (
            compression == "auto"
            and any(str(p).endswith(".gz")
                    for p in ([paths] if isinstance(paths, str)
                              else list(paths))))
        if not force_gz:
            ds = rd.read_text(paths, **read_kwargs)
            return ds.map_batches(
                lambda t: pa.table({"line": t["text"]}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
        framing_eff = "character"
    else:
        framing_eff = framing
    if framing_eff not in ("character", "length", "octet"):
        raise ValueError(f"unknown framing {framing!r}")
    files = rd.read_binary_files(paths, **read_kwargs)

    def frame_file(row: dict) -> list[dict]:
        payload = row["bytes"]
        if compression == "gzip" or (
                compression == "auto"
                and str(row.get("path", "")).endswith(".gz")) or (
                compression == "auto" and payload[:2] == b"\x1f\x8b"):
            import gzip

            payload = gzip.decompress(payload)
        if framing_eff == "character":
            frames = _frames_character(payload, delimiter)
        elif framing_eff == "length":
            frames = _frames_length(payload)
        else:
            frames = _frames_octet(payload)
        out = [{"line": f.decode(encoding, "replace")} for f in frames]
        if framing == "newline" and out and out[-1]["line"] == "":
            out.pop()  # trailing newline produces an empty last frame
        return out

    return files.flat_map(frame_file)
