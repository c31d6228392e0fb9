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
# dispatch
# ---------------------------------------------------------------------------
def sniff_format(payload: bytes) -> str | None:
    """Magic-byte detection for the supported formats."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
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
    raise ValueError("unsupported media payload (bmp/wav are decodable "
                     "without external libs; jpeg/png/mp3/mp4 need a real "
                     "image/audio library — see multimodal.set_decoder)")


__all__ = ["encode_bmp", "decode_bmp", "resize_bmp", "encode_wav",
           "decode_wav", "resample_wav", "sniff_format", "decode_media"]
