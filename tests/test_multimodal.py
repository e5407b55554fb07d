"""Multimodal stub stages: real Ray plumbing, deterministic fake kernels."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.ops import multimodal as mm


@pytest.fixture(scope="module")
def image_ds():
    rows = pd.DataFrame({
        "img_id": [1, 2, 3],
        "image": [b"\x89PNG" + bytes([i]) * 64 for i in range(3)],
    })
    return ray.data.from_pandas(rows)


def test_decode_images_schema(image_ds):
    out = mm.decode_images(image_ds).to_pandas()
    assert set(out.columns) >= {"img_id", "width", "height", "mode"}
    assert (out["width"] >= 16).all() and (out["height"] >= 16).all()
    # deterministic across runs
    out2 = mm.decode_images(image_ds).to_pandas()
    pd.testing.assert_frame_equal(out.sort_values("img_id").reset_index(drop=True),
                                  out2.sort_values("img_id").reset_index(drop=True))


def test_feature_extractor_unit_vectors(image_ds):
    out = mm.extract_features(image_ds, dim=8).to_pandas()
    mat = np.stack(out["embedding"].to_numpy())
    assert mat.shape == (3, 8)
    norms = np.linalg.norm(mat, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_frame_sampler_flat_map():
    vids = pd.DataFrame({"vid_id": [1], "video": [bytes(5 * (1 << 16))]})
    out = mm.sample_frames(ray.data.from_pandas(vids)).to_pandas()
    assert len(out) == 5
    assert out["frame_index"].tolist() == [0, 1, 2, 3, 4]
    assert all(isinstance(f, bytes) and len(f) == 32 for f in out["frame"])


def test_real_path_raises():
    dec = mm.ImageDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec(pd.DataFrame({"image": [b"x"]}))
