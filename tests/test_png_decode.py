"""Stdlib-zlib PNG pixel decode (VERDICT r7 item 6): _png_pixels must
invert a spec-conformant encoder for every scanline filter and the common
color types, and the full resize pipeline must produce REAL pixels for
PNG payloads end-to-end with no codec library and no injection."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from codegraphdb_spark.operators import multimodal

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_encode(pixels: bytes, w: int, h: int, color: int = 2,
                filters=None, palette: bytes = b"") -> bytes:
    """Minimal spec-conformant PNG writer (8-bit, non-interlaced) used as
    the test's independent source of truth for the decoder."""
    channels = _CHANNELS[color]
    stride = w * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride:(y + 1) * stride]
        f = (filters or [0] * h)[y]
        enc = bytearray(line)
        if f == 1:  # Sub
            for x in range(stride - 1, channels - 1, -1):
                enc[x] = (enc[x] - line[x - channels]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                enc[x] = (enc[x] - prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                enc[x] = (enc[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (enc[x] - pr) & 0xFF
        raw.append(f)
        raw += enc
        prev = line

    def chunk(t: bytes, d: bytes) -> bytes:
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette:
        out += chunk(b"PLTE", palette)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _to_rgb(pixels: bytes, color: int, palette: bytes = b"") -> bytes:
    channels = _CHANNELS[color]
    if color == 2:
        return pixels
    n = len(pixels) // channels
    rgb = bytearray(n * 3)
    for i in range(n):
        if color == 0:
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = pixels[i]
        elif color == 3:
            j = 3 * pixels[i]
            rgb[3 * i:3 * i + 3] = palette[j:j + 3]
        elif color == 4:
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = pixels[2 * i]
        else:  # 6
            rgb[3 * i:3 * i + 3] = pixels[channels * i:channels * i + 3]
    return bytes(rgb)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_unfilter_roundtrip_every_filter(filt):
    rng = random.Random(41 + filt)
    w, h = 13, 7
    pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
    png = _png_encode(pixels, w, h, color=2, filters=[filt] * h)
    rgb, gw, gh = multimodal._png_pixels(png)
    assert (gw, gh) == (w, h)
    assert rgb == pixels


def test_png_mixed_filters_roundtrip():
    rng = random.Random(97)
    w, h = 9, 10
    pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
    filters = [rng.randrange(5) for _ in range(h)]
    png = _png_encode(pixels, w, h, color=2, filters=filters)
    assert multimodal._png_pixels(png)[0] == pixels


@pytest.mark.parametrize("color", [0, 2, 3, 4, 6])
def test_png_color_types(color):
    rng = random.Random(7 + color)
    w, h = 6, 5
    channels = _CHANNELS[color]
    palette = bytes(rng.randrange(256) for _ in range(256 * 3))
    if color == 3:
        pixels = bytes(rng.randrange(256) for _ in range(w * h))
    else:
        pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
    png = _png_encode(pixels, w, h, color=color,
                      filters=[(y % 5) for y in range(h)],
                      palette=palette if color == 3 else b"")
    rgb, gw, gh = multimodal._png_pixels(png)
    assert (gw, gh) == (w, h)
    assert rgb == _to_rgb(pixels, color, palette)


def test_png_probe_and_rejects():
    # the codec probe's 1x1 RGBA PNG decodes to one real (transparent)
    # pixel — the seam's auto-selection now passes WITHOUT Pillow
    rgb, w, h = multimodal._png_pixels(multimodal._PROBE_PNG)
    assert (w, h) == (1, 1)
    assert len(rgb) == 3
    with pytest.raises(NotImplementedError):
        multimodal._png_pixels(b"FAKE" + struct.pack(">HH", 4, 4) + b"\0" * 48)
    # interlaced: loud refusal, never wrong pixels
    interlaced = bytearray(_png_encode(b"\x01" * 12, 2, 2, color=0))
    sig_ihdr_interlace = 8 + 8 + 12  # sig + len/type + 13th IHDR byte offset
    interlaced[sig_ihdr_interlace] = 1
    with pytest.raises(NotImplementedError):
        multimodal._png_pixels(bytes(interlaced))
    # truncated IDAT (cut into the deflate stream itself, not just the
    # checksum tail): loud
    rng = random.Random(11)
    big = bytes(rng.randrange(256) for _ in range(16 * 16 * 3))
    png = _png_encode(big, 16, 16)
    with pytest.raises(NotImplementedError):
        multimodal._png_pixels(png[:-400])


def test_nn_resize_semantics():
    # 2x1 RGB: left red, right blue -> upscale 4x2 keeps halves
    rgb = bytes([255, 0, 0, 0, 0, 255])
    out = multimodal._nn_resize_rgb(rgb, 2, 1, 4, 2)
    assert out == bytes([255, 0, 0] * 2 + [0, 0, 255] * 2) * 2
    # identity
    assert multimodal._nn_resize_rgb(rgb, 2, 1, 2, 1) == rgb


def test_resize_pipeline_real_png_end_to_end(spark, tmp_path):
    """No injection, no Pillow: a real PNG payload must come back with
    REAL resampled pixels (not the FAKE double) while a FAKE container in
    the same directory still falls back to the deterministic double."""
    rng = random.Random(3)
    w, h = 8, 6
    pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
    png = _png_encode(pixels, w, h, color=2, filters=[2] * h)
    fake = b"FAKE" + struct.pack(">HH", 640, 480) + b"\x07" * 100
    (tmp_path / "real.png").write_bytes(png)
    (tmp_path / "fake.img").write_bytes(fake)

    binary = multimodal.read_binary_dir(spark, str(tmp_path))
    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in multimodal.resize_images(binary, 4, 3).collect()}

    real = bytes(rows["real.png"]["thumbnail"])
    assert real == multimodal._nn_resize_rgb(pixels, w, h, 4, 3)
    assert not real.startswith(b"FAKE")
    assert (rows["real.png"]["src_width"], rows["real.png"]["src_height"]) \
        == (w, h)
    # undecodable payload: per-payload deterministic fallback, unchanged
    assert bytes(rows["fake.img"]["thumbnail"]) \
        == multimodal._fake_thumbnail(fake, 4, 3)
