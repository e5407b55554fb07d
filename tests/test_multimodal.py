"""Multimodal stages: REAL PNG/WAV/ANIM kernels (checksum + roundtrip
oracles) plus the fake hash-stub paths kept for non-decodable payloads."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.ops import imagecodec as ic
from nexus_forge_ray.ops import multimodal as mm


def _rng(seed=7):
    return np.random.default_rng(seed)


# ------------------------------------------------------------- codec oracles

@pytest.mark.parametrize("shape", [(5, 9), (8, 6, 3), (4, 4, 4), (3, 7, 2)])
def test_png_roundtrip_identity(shape):
    img = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
    back = ic.png_decode(ic.png_encode(img))
    np.testing.assert_array_equal(back, img.squeeze() if shape[-1] == 1 else img)


def test_png_decode_all_filter_types():
    # hand-build a PNG whose scanlines use filters 1..4 (our encoder only
    # emits 0) and check against a straight-line reference reconstruction
    import struct
    import zlib
    img = _rng(3).integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    h, w, c = img.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    filters = [0, 1, 2, 3, 4]
    for y, f in enumerate(filters):
        line = img[y].reshape(-1).astype(np.int16)
        enc = np.zeros(w * c, dtype=np.int16)
        for x in range(w * c):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                enc[x] = line[x]
            elif f == 1:
                enc[x] = line[x] - a
            elif f == 2:
                enc[x] = line[x] - b
            elif f == 3:
                enc[x] = line[x] - (int(a) + int(b)) // 2
            else:
                p = int(a) + int(b) - int(cc)
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                enc[x] = line[x] - pred
        raw.append(f)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = line.astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + ic._chunk(b"IHDR", ihdr)
           + ic._chunk(b"IDAT", zlib.compress(bytes(raw)))
           + ic._chunk(b"IEND", b""))
    np.testing.assert_array_equal(ic.png_decode(png), img)


def test_resize_nearest_exact():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = ic.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    np.testing.assert_array_equal(up[::2, ::2], img)
    down = ic.resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(down, img[[0, 2]][:, [0, 2]])


def test_wav_roundtrip_features():
    rate, freq, amp = 16000, 440.0, 0.5
    t = np.arange(rate) / rate           # 1 s sine
    samples = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    x, r = ic.wav_decode(ic.wav_encode(samples, rate))
    assert r == rate and len(x) == rate
    f = ic.audio_features(x, r)
    assert abs(f["duration_s"] - 1.0) < 1e-9
    assert abs(f["rms"] - amp / np.sqrt(2)) < 1e-3
    assert abs(f["zcr"] - 2 * freq / rate) < 1e-3
    assert abs(f["peak"] - amp) < 1e-3


# --------------------------------------------------------------- Ray stages

@pytest.fixture(scope="module")
def png_ds():
    rows = []
    for i in range(1, 4):
        img = _rng(i).integers(0, 256, size=(8 * i, 6 * i, 3), dtype=np.uint8)
        rows.append({"img_id": i, "image": ic.png_encode(img)})
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_decode_images_real(png_ds):
    out = mm.decode_images(png_ds).to_pandas().sort_values("img_id")
    assert out["height"].tolist() == [8, 16, 24]
    assert out["width"].tolist() == [6, 12, 18]
    assert out["mode"].tolist() == ["RGB", "RGB", "RGB"]


def test_resize_images_real(png_ds):
    out = mm.resize_images(png_ds, 10, 7).to_pandas()
    for b in out["image"]:
        assert ic.png_decode(b).shape == (7, 10, 3)


def test_feature_extractor_real_unit_vectors(png_ds):
    out = mm.extract_features(png_ds, dim=16).to_pandas()
    mat = np.stack(out["embedding"].to_numpy())
    assert mat.shape == (3, 16)
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)
    # constant image -> perfectly flat descriptor
    flat = ic.image_features(np.full((12, 12), 200, dtype=np.uint8), 16)
    assert np.allclose(flat, 0.25, atol=1e-6)


def test_frame_sampler_real_anim():
    frames = [np.full((4, 4), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50, 60)]
    vids = pd.DataFrame({"vid_id": [1], "video": [ic.anim_encode(frames)]})
    out = mm.sample_frames(ray.data.from_pandas(vids), stride=2).to_pandas()
    assert out["frame_index"].tolist() == [0, 2, 4]
    vals = [ic.png_decode(f)[0, 0] for f in out["frame"]]
    assert vals == [10, 30, 50]
    assert out["frame_h"].tolist() == [4, 4, 4]


def test_decode_audio_stage():
    rate = 8000
    clips = []
    for amp in (0.25, 0.5):
        s = (amp * np.sin(2 * np.pi * 100 * np.arange(rate) / rate)
             * 32767).astype(np.int16)
        clips.append(ic.wav_encode(s, rate))
    ds = ray.data.from_pandas(pd.DataFrame({"clip_id": [1, 2], "audio": clips}))
    out = mm.decode_audio(ds).to_pandas().sort_values("clip_id")
    assert out["sample_rate"].tolist() == [rate, rate]
    assert np.allclose(out["rms"], [0.25 / np.sqrt(2), 0.5 / np.sqrt(2)],
                       atol=1e-3)


# ------------------------------------------------------------- fake fallback

def test_fake_paths_still_work_for_opaque_bytes():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"img_id": [1, 2], "image": [b"\xffnot-a-png" * 9, b"zz" * 40]}))
    out = mm.decode_images(ds, fake=True).to_pandas()
    assert (out["width"] >= 16).all()
    out2 = mm.extract_features(ds, dim=8, fake=True).to_pandas()
    assert np.allclose(np.linalg.norm(np.stack(out2["embedding"]), axis=1), 1.0)
    vids = pd.DataFrame({"vid_id": [1], "video": [bytes(5 * (1 << 16))]})
    fr = mm.sample_frames(ray.data.from_pandas(vids), fake=True).to_pandas()
    assert fr["frame_index"].tolist() == [0, 1, 2, 3, 4]


def test_real_decode_rejects_garbage():
    with pytest.raises(ValueError):
        ic.png_decode(b"not a png at all")


def test_audio_spectral_sine_dominant():
    rate, n = 8000, 8000
    clips, ids = [], []
    for i, hz in enumerate((440, 1000)):
        s = (0.5 * np.sin(2 * np.pi * hz * np.arange(n) / rate)
             * 32767).astype(np.int16)
        clips.append(ic.wav_encode(s, rate))
        ids.append(i)
    ds = ray.data.from_pandas(pd.DataFrame({"clip_id": ids, "audio": clips}))
    out = mm.audio_spectral(ds).to_pandas().sort_values("clip_id")
    # 1-second clip -> 1 Hz bins: the dominant bin IS the sine frequency
    assert out["dominant_hz"].tolist() == [440.0, 1000.0]
    # centroid of a pure tone sits at the tone (leakage keeps it close)
    assert np.allclose(out["centroid_hz"], [440.0, 1000.0], atol=5.0)
    # band fractions sum to 1; the tone's band carries almost everything
    be = np.stack(out["band_energy"].to_numpy())
    assert np.allclose(be.sum(axis=1), 1.0, atol=1e-9)
    assert be[0, 0] > 0.99          # 440 Hz in band 0 of 8 (0-500 Hz)
    assert be[1, 2] > 0.99          # 1000 Hz in band 2 (1000-1500 Hz)


def test_bmp_roundtrip_rgb_and_grey():
    from nexus_forge_ray.ops import imagecodec as ic
    rng = np.random.RandomState(7)
    # width 5: the 15-byte row needs 1 pad byte — exercises stride padding
    rgb = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(ic.bmp_decode(ic.bmp_encode(rgb)), rgb)
    grey = rng.randint(0, 256, size=(4, 7), dtype=np.uint8)
    out = ic.bmp_decode(ic.bmp_encode(grey))
    assert out.shape == (4, 7, 3)
    for c in range(3):              # grey replicates across channels
        assert np.array_equal(out[:, :, c], grey)


def test_bmp_top_down_rows():
    import struct

    from nexus_forge_ray.ops import imagecodec as ic
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = bytearray(ic.bmp_encode(img))
    # flip the height sign -> top-down row order; rows must NOT be re-flipped
    (h,) = struct.unpack_from("<i", data, 22)
    struct.pack_into("<i", data, 22, -h)
    flipped = ic.bmp_decode(bytes(data))
    assert np.array_equal(flipped, img[::-1])


def test_image_decode_sniffs_containers():
    import pytest

    from nexus_forge_ray.ops import imagecodec as ic
    img = ((np.arange(64, dtype=np.int64) % 256).astype(np.uint8)
           .reshape(8, 8))
    assert np.array_equal(ic.image_decode(ic.png_encode(img)), img)
    bmp = ic.image_decode(ic.bmp_encode(img))
    assert np.array_equal(bmp[:, :, 0], img)
    with pytest.raises(ValueError, match="unknown image container"):
        ic.image_decode(b"GIF89a not supported")
