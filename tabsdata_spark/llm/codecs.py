"""Real pure-Python media codecs for simple public formats.

The container has no image/audio libraries, but two ubiquitous formats
need none — their specs are simple enough to decode with stdlib + numpy:

- **BMP** (Windows bitmap, uncompressed 24-bit BI_RGB): 14-byte file
  header + 40-byte BITMAPINFOHEADER + bottom-up rows padded to 4 bytes.
- **WAV** (RIFF PCM): stdlib `wave` handles framing; numpy computes
  features and linear-interpolation resampling.

These plug into the multimodal plumbing (multimodal.decoder_for), turning
the decode/featurize/resize path from a deterministic fake into a real
kernel for .bmp/.wav payloads; exotic formats (jpeg/png/mp3/mp4) still
need external libs and keep the documented stub.  Everything here runs
executor-side inside Arrow batches — payload bytes never visit the driver.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):                     # bottom-up rows
        row = pixels[y, :, ::-1].tobytes()             # RGB -> BGR
        body += row + pad
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> dict:
    """24-bit BI_RGB BMP -> {width, height, pixels (H,W,3 RGB uint8),
    features [mean_r, mean_g, mean_b, std_luma]}."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported "
                         f"(got bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=row_size * h,
                       offset=offset)
    px = px.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if flip:
        px = px[::-1]
    luma = px @ np.array([0.299, 0.587, 0.114])
    means = px.reshape(-1, 3).mean(axis=0)
    return {
        "width": int(w), "height": int(h), "pixels": px,
        "features": [round(float(means[0]) / 255.0, 6),
                     round(float(means[1]) / 255.0, 6),
                     round(float(means[2]) / 255.0, 6),
                     round(float(luma.std()) / 255.0, 6)],
    }


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize, re-encoded as BMP.  NN (not bilinear) keeps
    the kernel dependency-free and deterministic across platforms."""
    d = decode_bmp(payload)
    px = d["pixels"]
    ys = (np.arange(height) * d["height"] // height).clip(0, d["height"] - 1)
    xs = (np.arange(width) * d["width"] // width).clip(0, d["width"] - 1)
    return encode_bmp(np.ascontiguousarray(px[ys][:, xs]))


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float array in [-1, 1] -> 16-bit mono PCM WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """PCM WAV -> {sample_rate, n_channels, duration_ms, samples (float
    mono [-1,1]), features [rms, peak, zero_crossing_rate]}."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate, nch, width = (wf.getframerate(), wf.getnchannels(),
                            wf.getsampwidth())
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:                                    # 8-bit is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)             # downmix to mono
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    return {
        "sample_rate": rate, "n_channels": nch,
        "duration_ms": int(len(x) * 1000 / rate), "samples": x,
        "features": [round(float(np.sqrt(np.mean(x ** 2))), 6),
                     round(float(np.abs(x).max(initial=0.0)), 6),
                     round(zcr, 6)],
    }


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """Linear-interpolation resample to `target_rate`, 16-bit mono out."""
    d = decode_wav(payload)
    x, rate = d["samples"], d["sample_rate"]
    if rate == target_rate:
        return encode_wav(x, rate)
    n_out = max(1, int(round(len(x) * target_rate / rate)))
    t_out = np.linspace(0, len(x) - 1, n_out)
    return encode_wav(np.interp(t_out, np.arange(len(x)), x), target_rate)


# ---------------------------------------------------------------------------
# AVI (RIFF container, uncompressed DIB video frames)
# ---------------------------------------------------------------------------
# The third modality, real like BMP/WAV: the AVI RIFF layout
# (hdrl{avih,strl{strh,strf}} + movi{00db...} + idx1) is a public
# Microsoft spec simple enough for struct.  Frames are stored exactly as
# BMP pixel data (BGR, bottom-up, 4-byte row padding), so the decoder
# reuses the BMP row math and sampled frames re-encode as standalone BMPs
# for the image pipeline.  Compressed AVI (MJPG/h264) still needs a real
# library and raises like jpeg/png.

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + \
        (b"\x00" if len(body) % 2 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(N, H, W, 3) uint8 RGB -> uncompressed AVI ('DIB ' / '00db')."""
    n, h, w, _ = frames.shape
    row_size = (w * 3 + 3) & ~3
    frame_size = row_size * h
    avih = _chunk(b"avih", struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0x10,  # HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0))
    strh = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_size, 0xFFFFFFFF, 0, 0, 0, int(w), int(h)))
    strf = _chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    pad = b"\x00" * (row_size - w * 3)
    movi_body = b""
    index = b""
    offset = 4                                         # relative to 'movi'
    for f in range(n):
        body = bytearray()
        for y in range(h - 1, -1, -1):                 # bottom-up BGR rows
            body += frames[f, y, :, ::-1].tobytes() + pad
        ck = _chunk(b"00db", bytes(body))
        movi_body += ck
        index += struct.pack("<4sIII", b"00db", 0x10, offset, frame_size)
        offset += len(ck)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", index)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _riff_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_offset, body_size) over a RIFF chunk range."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)                   # word-aligned


def decode_avi(payload: bytes) -> dict:
    """Uncompressed AVI -> {width, height, n_frames, fps, frame_offsets,
    features [mean_luma, mean_frame_delta]}.  Frames decode lazily via
    avi_frame() — a video payload never materializes all frames at once."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = n = 0
    us_per_frame = 1
    frame_offsets: list[tuple[int, int]] = []

    def walk(start: int, end: int):
        nonlocal w, h, n, us_per_frame
        for fourcc, off, size in _riff_chunks(payload, start, end):
            if fourcc == b"LIST":
                kind = payload[off:off + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(off + 4, off + size)
            elif fourcc == b"avih":
                us_per_frame, _, _, _, n, _, _, _, w, h = \
                    struct.unpack_from("<IIIIIIIIII", payload, off)
            elif fourcc in (b"00db", b"00dc"):
                frame_offsets.append((off, size))

    walk(12, len(payload))
    if not frame_offsets:
        raise ValueError("AVI contains no video frames")
    row_size = (w * 3 + 3) & ~3
    if frame_offsets[0][1] != row_size * h:
        raise ValueError("only uncompressed 24-bit DIB AVI supported "
                         "(compressed streams need a video library)")
    fps = round(1_000_000 / us_per_frame) if us_per_frame else 0
    first = _dib_to_rgb(payload, frame_offsets[0], w, h)
    luma_w = np.array([0.299, 0.587, 0.114])
    deltas = []
    prev = first
    for fo in frame_offsets[1:]:
        cur = _dib_to_rgb(payload, fo, w, h)
        deltas.append(np.abs(cur.astype(np.int16) - prev).mean())
        prev = cur
    return {
        "width": int(w), "height": int(h),
        "n_frames": len(frame_offsets), "fps": fps,
        "frame_offsets": frame_offsets,
        "features": [round(float((first @ luma_w).mean()) / 255.0, 6),
                     round(float(np.mean(deltas)) / 255.0, 6)
                     if deltas else 0.0],
    }


def _dib_to_rgb(payload: bytes, fo: tuple[int, int], w: int, h: int) -> np.ndarray:
    off, size = fo
    row_size = (w * 3 + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=row_size * h,
                       offset=off)
    return px.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]


def avi_frame(payload: bytes, meta: dict, idx: int) -> bytes:
    """Extract frame `idx` re-encoded as a standalone BMP (feeds the image
    decode/featurize/resize pipeline)."""
    return encode_bmp(np.ascontiguousarray(_dib_to_rgb(
        payload, meta["frame_offsets"][idx], meta["width"], meta["height"])))


def sample_avi_frames(payload: bytes, max_frames: int = 8) -> list[tuple[int, bytes]]:
    """Evenly-spaced frame sample as [(frame_idx, bmp_bytes)] — the
    video -> image feature-extraction step."""
    meta = decode_avi(payload)
    n = meta["n_frames"]
    take = min(n, max_frames)
    idxs = sorted({int(round(i * (n - 1) / max(take - 1, 1)))
                   for i in range(take)})
    return [(i, avi_frame(payload, meta, i)) for i in idxs]


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------
def sniff_format(payload: bytes) -> str | None:
    """Magic-byte detection for the supported formats."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


def decode_media(payload: bytes) -> dict:
    """Decode any supported payload to the multimodal decoder contract
    (width/height/features).  Audio maps duration->width, channels->height
    so one schema serves both modalities."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        d = decode_bmp(payload)
        return {"width": d["width"], "height": d["height"],
                "features": d["features"]}
    if fmt == "wav":
        d = decode_wav(payload)
        return {"width": d["duration_ms"], "height": d["n_channels"],
                "features": d["features"]}
    if fmt == "avi":
        d = decode_avi(payload)
        return {"width": d["width"], "height": d["height"],
                "features": d["features"]}
    raise ValueError("unsupported media payload (bmp/wav/avi are decodable "
                     "without external libs; jpeg/png/mp3/mp4 need a real "
                     "image/audio library — see multimodal.set_decoder)")


__all__ = ["encode_bmp", "decode_bmp", "resize_bmp", "encode_wav",
           "decode_wav", "resample_wav", "encode_avi", "decode_avi",
           "avi_frame", "sample_avi_frames", "sniff_format", "decode_media"]
