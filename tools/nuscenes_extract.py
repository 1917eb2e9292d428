"""NuScenes -> preprocessed training layout extractor (VERDICT r4 item 8).

The reference's NuScenes loader (``nerf/internal/datasets.py:596-878``)
walks the nuscenes devkit per sample_data chain at load time — and is
non-functional as shipped (``datasets.py:606-610`` builds a set of lists).
This repo's ``NuScenesDataset`` instead trains from the same on-disk layout
as the Waymo loader; THIS tool is the executable form of that loader's
docstring contract: run the devkit once, write the layout, train from disk.

Layout written (see ``data/datasets.py`` WaymoV2Dataset docstring):

    outdir/images/cam_{i}/%08d.jpg    RGB frames (native 1600x900)
    outdir/masks/cam_{i}/%08d.npz     semantic masks (class 142 = sky;
                                      zeros when no segmentation source)
    outdir/scenario.pt                pickled {"observers": {camera_NAME:
                                      {"class_name": "Camera", "data":
                                      {"intr": [F,3,3], "c2w": [F,4,4]}}}}

Camera channel mapping (reference datasets.py:617-629 x this repo's
cam_order): CAM_FRONT->camera_FRONT (cam_1), CAM_FRONT_LEFT (cam_2),
CAM_FRONT_RIGHT (cam_3), CAM_BACK_LEFT->camera_SIDE_LEFT (cam_4),
CAM_BACK_RIGHT->camera_SIDE_RIGHT (cam_5).

c2w composes ego2global @ cam2ego from the devkit's ego_pose and
calibrated_sensor records (the path the reference sketches at
datasets.py:686-693) — these are the INITIAL poses that the pose-refinement
pipeline (``ucnerf_tpu.pose.pipeline``) later overrides via pose.json.

The devkit is optional at import: ``write_layout`` is a pure function over
in-memory frames (fixture-tested without the devkit); ``extract_scene``
needs ``pip install nuscenes-devkit`` and a NuScenes dataroot.

Usage:
  python tools/nuscenes_extract.py --dataroot /data/nuscenes \
      --scene scene-0061 --out /data/nuscenes_prep/scene-0061 \
      [--version v1.0-trainval] [--cams 3] [--frames 120] \
      [--seg-dir /data/nuscenes_seg]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

# NuScenes channel -> (scenario.pt observer name, cam_{i} directory index).
CHANNEL_MAP = [
    ("CAM_FRONT", "camera_FRONT", 1),
    ("CAM_FRONT_LEFT", "camera_FRONT_LEFT", 2),
    ("CAM_FRONT_RIGHT", "camera_FRONT_RIGHT", 3),
    ("CAM_BACK_LEFT", "camera_SIDE_LEFT", 4),
    ("CAM_BACK_RIGHT", "camera_SIDE_RIGHT", 5),
]
NATIVE_W, NATIVE_H = 1600, 900
SKY_CLASS = 142  # reference datasets.py:615


def quat_wxyz_to_rotmat(q):
    """Unit quaternion (w, x, y, z) -> 3x3 rotation (devkit convention)."""
    w, x, y, z = [float(v) for v in q]
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def write_layout(outdir, cams):
    """Write the preprocessed layout from in-memory per-camera frames.

    Args:
      outdir: destination directory.
      cams: list of dicts, one per camera, each with keys
        ``observer`` (scenario observer name), ``cam_dir`` (1-based cam_{i}
        index), ``images`` (list of HxWx3 uint8 arrays), ``intr``
        ([F, 3, 3]), ``c2w`` ([F, 4, 4]), and optional ``segs`` (list of
        HxW uint8 semantic maps, or None -> zero masks).
    """
    from PIL import Image

    observers = {}
    for cam in cams:
        d_img = os.path.join(outdir, "images", f"cam_{cam['cam_dir']}")
        d_msk = os.path.join(outdir, "masks", f"cam_{cam['cam_dir']}")
        os.makedirs(d_img, exist_ok=True)
        os.makedirs(d_msk, exist_ok=True)
        n = len(cam["images"])
        segs = cam.get("segs") or [None] * n
        for f in range(n):
            Image.fromarray(cam["images"][f]).save(
                os.path.join(d_img, f"{f:08d}.jpg"), quality=95)
            seg = segs[f]
            if seg is None:
                seg = np.zeros(cam["images"][f].shape[:2], np.uint8)
            np.savez(os.path.join(d_msk, f"{f:08d}.npz"), seg)
        observers[cam["observer"]] = {
            "class_name": "Camera",
            "data": {
                "intr": np.asarray(cam["intr"], np.float64),
                "c2w": np.asarray(cam["c2w"], np.float64),
            },
        }
    with open(os.path.join(outdir, "scenario.pt"), "wb") as f:
        pickle.dump({"observers": observers}, f)


def extract_scene(dataroot, scene_name, version="v1.0-trainval",
                  num_cams=3, num_frames=120, seg_dir=None):
    """Walk the devkit's sample_data chains and build write_layout inputs.

    Mirrors the reference's chain walk (datasets.py:649-725): per channel,
    start at the scene's first sample and follow ``next`` links, taking the
    first ``num_frames`` frames; images resize to the native 1600x900 with
    intrinsics rescaled (datasets.py:672-676).
    """
    from PIL import Image

    try:
        from nuscenes.nuscenes import NuScenes
    except ImportError as e:  # pragma: no cover - devkit not in this image
        raise ImportError(
            "nuscenes-devkit is required for extraction (pip install "
            "nuscenes-devkit); write_layout itself has no devkit "
            "dependency") from e

    nusc = NuScenes(version=version, dataroot=dataroot, verbose=False)
    scene = next(s for s in nusc.scene if s["name"] == scene_name)
    first = nusc.get("sample", scene["first_sample_token"])

    cams = []
    for channel, observer, cam_dir in CHANNEL_MAP[:num_cams]:
        sd = nusc.get("sample_data", first["data"][channel])
        images, segs, intrs, c2ws = [], [], [], []
        while len(images) < num_frames and sd is not None:
            path = os.path.join(dataroot, sd["filename"])
            img = Image.open(path)
            ow, oh = img.size
            img = img.resize((NATIVE_W, NATIVE_H), Image.BILINEAR)
            images.append(np.asarray(img, np.uint8))

            cal = nusc.get("calibrated_sensor",
                           sd["calibrated_sensor_token"])
            intr = np.asarray(cal["camera_intrinsic"], np.float64).copy()
            intr[0, :] *= NATIVE_W / ow
            intr[1, :] *= NATIVE_H / oh
            intrs.append(intr)

            ego = nusc.get("ego_pose", sd["ego_pose_token"])
            ego2global = np.eye(4)
            ego2global[:3, :3] = quat_wxyz_to_rotmat(ego["rotation"])
            ego2global[:3, 3] = ego["translation"]
            cam2ego = np.eye(4)
            cam2ego[:3, :3] = quat_wxyz_to_rotmat(cal["rotation"])
            cam2ego[:3, 3] = cal["translation"]
            c2ws.append(ego2global @ cam2ego)

            if seg_dir is not None:
                base = os.path.splitext(os.path.basename(sd["filename"]))[0]
                seg_path = os.path.join(seg_dir, f"{channel}_{base}.png")
                seg = (np.asarray(Image.open(seg_path).resize(
                    (NATIVE_W, NATIVE_H), Image.NEAREST), np.uint8)
                    if os.path.exists(seg_path) else None)
                segs.append(seg)
            sd = (nusc.get("sample_data", sd["next"]) if sd["next"]
                  else None)
        cams.append(dict(observer=observer, cam_dir=cam_dir, images=images,
                         segs=segs if seg_dir else None,
                         intr=np.stack(intrs), c2w=np.stack(c2ws)))
    return cams


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--scene", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--cams", type=int, default=3, choices=(1, 2, 3, 4, 5))
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--seg-dir", default=None,
                    help="optional dir of per-frame semantic PNGs "
                         "(CHANNEL_basename.png, class 142 = sky)")
    args = ap.parse_args()
    cams = extract_scene(args.dataroot, args.scene, version=args.version,
                         num_cams=args.cams, num_frames=args.frames,
                         seg_dir=args.seg_dir)
    write_layout(args.out, cams)
    print(f"wrote {len(cams)} cameras x {len(cams[0]['images'])} frames "
          f"to {args.out}")


if __name__ == "__main__":
    main()
