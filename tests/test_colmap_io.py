"""COLMAP database + binary model roundtrips, keypoint quantization,
NN matching, augmentors."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.eval.colmap_io import (
    ColmapDatabase,
    image_ids_to_pair_id,
    pair_id_to_image_ids,
    quantize_keypoints,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (2, 1), (100, 100000)]:
        pid = image_ids_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert pair_id_to_image_ids(pid) == (lo, hi)


def test_database_roundtrip(tmp_path):
    db = ColmapDatabase(str(tmp_path / "test.db"))
    cam = db.add_camera(1, 640, 480, [500.0, 320, 240])
    i1 = db.add_image("a.jpg", cam)
    i2 = db.add_image("b.jpg", cam)
    kps = np.random.default_rng(0).random((10, 2)).astype(np.float32) * 640
    db.add_keypoints(i1, kps)
    matches = np.array([[0, 3], [1, 5], [2, 2]], np.uint32)
    db.add_matches(i1, i2, matches)
    db.add_two_view_geometry(i1, i2, matches)

    np.testing.assert_allclose(db.read_keypoints(i1), kps)
    np.testing.assert_array_equal(db.read_matches(i1, i2), matches)
    db.close()


def test_binary_model_roundtrip(tmp_path):
    cams = {1: {"model_id": 1, "width": 640, "height": 480,
                "params": np.array([500.0, 320, 240, 0.0])}}
    images = {1: {"qvec": np.array([1.0, 0, 0, 0]),
                  "tvec": np.array([0.1, 0.2, 0.3]),
                  "camera_id": 1, "name": "img1.jpg",
                  "xys": np.array([[1.5, 2.5], [3.0, 4.0]]),
                  "point3D_ids": np.array([7, -1], np.int64)}}
    points = {7: {"xyz": np.array([1.0, 2.0, 3.0]),
                  "rgb": np.array([10, 20, 30], np.uint8), "error": 0.5,
                  "track": [(1, 0)]}}
    write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    write_images_binary(images, str(tmp_path / "images.bin"))
    write_points3d_binary(points, str(tmp_path / "points3D.bin"))

    c2 = read_cameras_binary(str(tmp_path / "cameras.bin"))
    np.testing.assert_allclose(c2[1]["params"], cams[1]["params"])
    i2 = read_images_binary(str(tmp_path / "images.bin"))
    assert i2[1]["name"] == "img1.jpg"
    np.testing.assert_allclose(i2[1]["xys"], images[1]["xys"])
    np.testing.assert_array_equal(i2[1]["point3D_ids"], [7, -1])
    p2 = read_points3d_binary(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(p2[7]["xyz"], points[7]["xyz"])
    assert p2[7]["track"] == [(1, 0)]


def test_quantize_keypoints_merges_close_points():
    kp_data = {"kps": [], "kp_means": {}}
    ids1 = quantize_keypoints(np.array([[10.0, 10.0], [12.0, 11.0]]), kp_data,
                              psize=48, dthres=4)
    assert ids1[0] == ids1[1] == 0            # merged
    ids2 = quantize_keypoints(np.array([[30.0, 30.0]]), kp_data, psize=48,
                              dthres=4)
    assert ids2[0] == 1                        # same cell, too far -> new kp
    ids3 = quantize_keypoints(np.array([[100.0, 100.0]]), kp_data, psize=48,
                              dthres=4)
    assert ids3[0] == 2                        # different cell
    assert len(kp_data["kps"]) == 3


def test_nn_matching_mutual():
    from geoformer_tpu.eval.nn_matching import mutual_nn_match

    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(8, 16)).astype(np.float32)
    perm = rng.permutation(8)
    d0 = d1[perm] + 0.01 * rng.normal(size=(8, 16)).astype(np.float32)
    idx, valid, sim = mutual_nn_match(jnp.asarray(d0), jnp.asarray(d1))
    assert bool(valid.all())
    np.testing.assert_array_equal(np.asarray(idx), perm)


def test_augmentors_preserve_shape_and_range():
    from geoformer_tpu.data.augment import build_augmentor

    img = jnp.asarray(np.random.default_rng(1).random((2, 32, 40, 1)),
                      jnp.float32)
    for method in (None, "dark", "mobile"):
        aug = build_augmentor(method)
        out = aug(jax.random.key(0), img)
        assert out.shape == img.shape
        assert float(out.min()) >= -1e-5 and float(out.max()) <= 1.0 + 1e-5


def test_localization_export_pipeline(tmp_path):
    import h5py

    from geoformer_tpu.eval.localization import (
        build_colmap_database,
        collect_quantized_matches,
        export_h5,
    )

    rng = np.random.default_rng(2)
    m01 = rng.random((20, 4)).astype(np.float32) * 400
    m12 = rng.random((15, 4)).astype(np.float32) * 400
    pair_matches = {("a.jpg", "b.jpg"): m01, ("b.jpg", "c.jpg"): m12}
    keypoints, matches_ids = collect_quantized_matches(pair_matches)
    assert set(keypoints) == {"a.jpg", "b.jpg", "c.jpg"}
    assert matches_ids[("a.jpg", "b.jpg")].shape == (20, 2)
    # ids must index into the keypoint sets
    for (n0, n1), ids in matches_ids.items():
        assert ids[:, 0].max() < len(keypoints[n0])
        assert ids[:, 1].max() < len(keypoints[n1])

    fpath = str(tmp_path / "feats.h5")
    mpath = str(tmp_path / "matches.h5")
    export_h5(keypoints, matches_ids, fpath, mpath)
    with h5py.File(fpath) as f:
        assert f["a.jpg"]["keypoints"].shape[1] == 2

    images = {n: {"width": 400, "height": 400, "params": [400.0, 200, 200, 0]}
              for n in keypoints}
    ids = build_colmap_database(str(tmp_path / "db.db"), images, keypoints,
                                matches_ids)
    assert len(ids) == 3
