import numpy as np
import pytest

from ucnerf_tpu.pose import colmap_io as cio


def test_cameras_binary_roundtrip(tmp_path):
    cams = {
        1: cio.Camera(1, "SIMPLE_PINHOLE", 640, 480,
                      np.array([500.0, 320.0, 240.0])),
        2: cio.Camera(2, "PINHOLE", 800, 600,
                      np.array([400.0, 410.0, 400.0, 300.0])),
    }
    path = tmp_path / "cameras.bin"
    cio.write_cameras_binary(cams, path)
    back = cio.read_cameras_binary(path)
    assert set(back) == {1, 2}
    assert back[1].model == "SIMPLE_PINHOLE"
    np.testing.assert_allclose(back[2].params, cams[2].params)


def test_images_binary_roundtrip(tmp_path):
    ims = {
        1: cio.Image(1, np.array([1.0, 0, 0, 0]), np.array([0.1, 0.2, 0.3]),
                     1, "cam_1/00000000.jpg",
                     np.array([[1.5, 2.5], [3.5, 4.5]]),
                     np.array([7, -1], np.int64)),
    }
    path = tmp_path / "images.bin"
    cio.write_images_binary(ims, path)
    back = cio.read_images_binary(path)
    im = back[1]
    assert im.name == "cam_1/00000000.jpg"
    np.testing.assert_allclose(im.qvec, ims[1].qvec)
    np.testing.assert_allclose(im.xys, ims[1].xys)
    np.testing.assert_array_equal(im.point3D_ids, ims[1].point3D_ids)


def test_points3d_binary_roundtrip(tmp_path):
    pts = {
        5: cio.Point3D(5, np.array([1.0, 2.0, 3.0]),
                       np.array([10, 20, 30], np.uint8), 0.5,
                       np.array([1, 2], np.int32),
                       np.array([0, 1], np.int32)),
    }
    path = tmp_path / "points3D.bin"
    cio.write_points3D_binary(pts, path)
    back = cio.read_points3D_binary(path)
    np.testing.assert_allclose(back[5].xyz, pts[5].xyz)
    np.testing.assert_array_equal(back[5].image_ids, pts[5].image_ids)


def test_database_roundtrip(tmp_path):
    db = cio.ColmapDatabase(tmp_path / "db.db")
    cam = db.add_camera("SIMPLE_PINHOLE", 640, 480, [500, 320, 240])
    im1 = db.add_image("a.jpg", cam, qvec=[1, 0, 0, 0], tvec=[0, 0, 0])
    im2 = db.add_image("b.jpg", cam)
    kps = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    db.add_keypoints(im1, kps)
    db.add_descriptors(im1, np.zeros((3, 128), np.uint8))
    matches = np.array([[0, 1], [2, 0]])
    db.add_matches(im1, im2, matches)
    db.add_two_view_geometry(im1, im2, matches)
    db.commit()

    import sqlite3
    conn = sqlite3.connect(tmp_path / "db.db")
    rows, cols, blob = conn.execute(
        "SELECT rows, cols, data FROM keypoints WHERE image_id=?",
        (im1,)).fetchone()
    kp_back = np.frombuffer(blob, np.float32).reshape(rows, cols)
    np.testing.assert_allclose(kp_back[:, :2], kps)
    n = conn.execute("SELECT COUNT(*) FROM two_view_geometries").fetchone()[0]
    assert n == 1
    pid = cio.pair_id(im1, im2)
    got = conn.execute("SELECT rows FROM matches WHERE pair_id=?",
                       (pid,)).fetchone()
    assert got[0] == 2


def test_text_writers(tmp_path):
    cams = {1: cio.Camera(1, "SIMPLE_PINHOLE", 64, 48,
                          np.array([50.0, 32.0, 24.0]))}
    ims = {1: cio.Image(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
                        "x.jpg", np.zeros((0, 2)), np.zeros(0, np.int64))}
    cio.write_cameras_text(cams, tmp_path / "cameras.txt")
    cio.write_images_text(ims, tmp_path / "images.txt")
    assert "SIMPLE_PINHOLE" in open(tmp_path / "cameras.txt").read()
    assert "x.jpg" in open(tmp_path / "images.txt").read()
