"""Spec tests for the stdlib-only multimodal codecs
(json_schema_ray/engine/codecs.py): PNG per RFC 2083 and RIFF/WAVE
PCM16. These are the compensating evidence for the rows-only
multimodal queries — SQL cannot decode PNG/RIFF, so the codecs are
pinned here instead: encode/decode roundtrips, a decoder differential
against independently forward-filtered scanlines for EVERY PNG filter
type, resize gather math, and feature formulas recomputed by hand.
"""

import struct
import zlib

import numpy as np
import pytest

from json_schema_ray.engine.codecs import (decode_png, decode_wav,
                                           encode_png, encode_wav,
                                           png_image_features,
                                           png_resize, raster_features,
                                           resize_nearest,
                                           wav_audio_features)


@pytest.mark.parametrize("shape", [(1, 1, 1), (7, 5, 1), (16, 16, 3),
                                   (9, 11, 4), (33, 2, 3)])
def test_png_roundtrip_shapes(shape):
    rng = np.random.default_rng(sum(shape))
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    b = decode_png(encode_png(a))
    assert b.shape == shape and (a == b).all()


def _forward_filter(raster: np.ndarray, ftype: int,
                    prior: np.ndarray) -> np.ndarray:
    """Reference forward filtering per RFC 2083 §6 (bpp = channels
    for 8-bit), written independently of the decoder."""
    w, c = raster.shape
    line = raster.astype(np.int16)
    out = np.zeros_like(line)
    for x in range(w):
        left = line[x - 1] if x > 0 else np.zeros(c, np.int16)
        up = prior[x].astype(np.int16)
        upleft = (prior[x - 1].astype(np.int16) if x > 0
                  else np.zeros(c, np.int16))
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:  # Paeth
            p = left + up - upleft
            cand = np.stack([left, up, upleft])
            dist = np.abs(p[None, :] - cand)
            # Paeth tiebreak order: left, up, upleft
            pick = np.where(
                (dist[0] <= dist[1]) & (dist[0] <= dist[2]), cand[0],
                np.where(dist[1] <= dist[2], cand[1], cand[2]))
            pred = pick
        out[x] = (line[x] - pred) & 0xFF
    return out.astype(np.uint8)


def test_png_decoder_every_filter_type_differential():
    """Hand-build a PNG whose five scanlines use filters 0..4 (the
    forward filtering implemented independently above) and check the
    decoder reproduces the original raster exactly."""
    rng = np.random.default_rng(99)
    h, w, c = 5, 13, 3
    raster = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    lines = []
    prior = np.zeros((w, c), np.uint8)
    for y in range(h):
        f = y % 5
        filtered = _forward_filter(raster[y], f, prior)
        lines.append(bytes([f]) + filtered.tobytes())
        prior = raster[y]
    raw = b"".join(lines)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2,
                                        0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    got = decode_png(png)
    assert (got == raster).all()


def test_png_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth is out of scope -> declared NotImplementedError
    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2,
                                        0, 0, 0)))
    with pytest.raises(NotImplementedError):
        decode_png(png)


def test_resize_nearest_gather_math():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(a, 8, 8)
    assert up.shape == (8, 8, 1)
    # each source pixel becomes a 2x2 block under exact 2x upscale
    assert (up[::2, ::2, 0] == a[:, :, 0]).all()
    down = resize_nearest(a, 2, 2)
    assert (down[:, :, 0] == a[::2, ::2, 0]).all()
    roundtrip = decode_png(png_resize(encode_png(a), 2, 2))
    assert (roundtrip == down).all()


def test_raster_features_formulas():
    a = np.zeros((4, 4, 3), np.uint8)
    a[:, :, 0] = 100  # R=100, G=0, B=0 -> lum ~ 33.33
    f = raster_features(a, dim=16)
    assert f[0] == 4.0 and f[1] == 4.0 and f[2] == 3.0
    assert f[3] == pytest.approx(100 / 3)      # global mean
    assert f[7] == pytest.approx(100.0)        # channel-0 mean
    assert f[8] == 0.0 and f[10] == 0.0        # G mean, 4th chan pad
    hist = f[11:16]
    assert hist.sum() == pytest.approx(1.0)    # density over 5 bins
    assert hist[0] == pytest.approx(1.0)       # all lum in [0, 51)
    # feature path through the encoder matches the raster path
    assert (png_image_features(encode_png(a), 16) == f).all()


def test_y4m_roundtrip_and_sampling():
    from json_schema_ray.engine.codecs import (decode_y4m, encode_y4m,
                                               y4m_luma_frames)

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (7, 10, 12), dtype=np.uint8)
    payload = encode_y4m(frames, fps=30)
    assert payload.startswith(b"YUV4MPEG2 W12 H10 F30:1")
    got = decode_y4m(payload)
    assert got.shape == (7, 10, 12) and (got == frames).all()
    sampled = y4m_luma_frames(payload, 3)  # frames 0, 3, 6
    assert len(sampled) == 3
    for orig, raw in zip(frames[::3], sampled):
        assert np.frombuffer(raw, np.uint8).reshape(10, 12).tolist() \
            == orig.tolist()


def test_y4m_error_paths():
    from json_schema_ray.engine.codecs import decode_y4m, encode_y4m

    with pytest.raises(ValueError):
        decode_y4m(b"RIFFnot a y4m\n")
    with pytest.raises(ValueError):
        encode_y4m(np.zeros((2, 3, 4), np.uint8))  # odd height
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\n....")


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-30000, 30000, 777).astype(np.int16)
    pcm, rate = decode_wav(encode_wav(mono, 22050))
    assert rate == 22050 and (pcm == mono).all()
    # stereo decode (hand-built RIFF via the wave module)
    import io
    import wave as _w
    inter = rng.integers(-1000, 1000, 400).astype(np.int16)
    buf = io.BytesIO()
    with _w.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(inter.tobytes())
    pcm2, rate2 = decode_wav(buf.getvalue())
    assert rate2 == 8000 and pcm2.shape == (200, 2)
    assert (pcm2.reshape(-1) == inter).all()


def test_wav_audio_features_formulas():
    # constant +/- square wave: rms == peak == amp, zcr == 1
    amp = 16384
    x = np.tile(np.array([amp, -amp], np.int16), 500)
    f = wav_audio_features(encode_wav(x, 16000), dim=16)
    assert f[0] == 1000.0 and f[1] == 16000.0
    assert f[2] == pytest.approx(1000 / 16000)
    assert f[3] == pytest.approx(amp / 32768.0)
    assert f[4] == pytest.approx(amp / 32768.0)
    assert f[5] == pytest.approx(1.0, abs=2e-3)
    assert sum(f[6:10]) == pytest.approx(1.0, abs=1e-9)
