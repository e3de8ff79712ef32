"""ScanNet (noisy real-world) dataset loader.

Behavioral parity with /root/reference/datasets/loader_scannet.py:17-201:
 * {split}_split_idx.txt frame indices; {split}/{split}_images/{i}.jpg RGB;
   {split}/{split}_pose/{i}.txt 4x4 poses; {split}/{split}_ins/{i}.npz instance maps
   (key ins_2d_label_id);
 * optional nearest-neighbor resize to 640x480 (cv2 INTER_NEAREST, resize:29-40);
   intrinsics from intrinsic/intrinsic_depth.txt when resized, else
   intrinsic_color.txt (loader_scannet.py:96-101);
 * label semantics: ins_num = (#unique labels) - 1; palette truncated to ins_num;
   unlabeled -1 remapped to ins_num ("air", loader_scannet.py:150-153);
 * center crop mask of size (crop_width, crop_height) (crop_data:17-24);
 * weakly-supervised pixel selection: per train image, the labeled-pixel ids inside
   the crop, subsampled by weakly_value (selected_pixels:156-181). The released code
   calls this as an unbound method (a latent TypeError, SURVEY.md §4) — fixed here.
"""

from __future__ import annotations

import os

import numpy as np

from dmnerf_tpu.configs import Config
from dmnerf_tpu.data.dmsr import _read_image, load_palette
from dmnerf_tpu.data.scene import SceneData


def crop_mask_for(H: int, W: int, crop_w: int, crop_h: int) -> np.ndarray:
    """Center crop mask (reference crop_data, loader_scannet.py:17-24)."""
    mask = np.zeros((H, W), np.int8)
    mh, mw = (H - crop_h) // 2, (W - crop_w) // 2
    mask[mh:H - mh, mw:W - mw] = 1
    return mask


def _resize_stack(data: np.ndarray, H: int = 480, W: int = 640) -> np.ndarray:
    import cv2

    out = np.zeros((data.shape[0], H, W) + data.shape[3:], data.dtype)
    for i, d in enumerate(data):
        out[i] = cv2.resize(d, (W, H), interpolation=cv2.INTER_NEAREST)
    return out


def selected_pixels(full_ins: np.ndarray, ins_num: int, crop_mask: np.ndarray,
                    weakly_value: float = 1.0, rng: np.random.Generator | None = None):
    """Per-image flat indices of labeled pixels inside the crop, subsampled by
    weakly_value (reference selected_pixels / weakly_img, loader_scannet.py:156-181)."""
    if rng is None:
        rng = np.random.default_rng(0)
    N = full_ins.shape[0]
    flat = full_ins.reshape(N, -1)
    crop_flat = crop_mask.reshape(-1)
    all_hws = []
    for i in range(N):
        ins = flat[i].copy()
        ins[crop_flat == 0] = ins_num
        labeled = np.where(ins != ins_num)[0]
        n_sel = int(len(labeled) * weakly_value)
        sel = rng.choice(len(labeled), size=n_sel, replace=False)
        all_hws.append(labeled[sel])
    return all_hws


def load_scannet(cfg: Config) -> SceneData:
    basedir = cfg.datadir

    def _split(split: str, skip: int):
        idx = np.loadtxt(os.path.join(basedir, f"{split}_split_idx.txt")).astype(np.int32).reshape(-1)
        root = os.path.join(basedir, split)
        rgbs = np.array([_read_image(os.path.join(root, f"{split}_images", f"{i}.jpg")) for i in idx])
        poses = np.array([np.loadtxt(os.path.join(root, f"{split}_pose", f"{i}.txt")) for i in idx])
        ins = np.array(
            [np.load(os.path.join(root, f"{split}_ins", f"{i}.npz"))["ins_2d_label_id"] for i in idx]
        )
        sel = np.arange(0, len(rgbs), skip)
        return (rgbs[sel] / 255.0).astype(np.float32), poses[sel].astype(np.float32), ins[sel]

    skip_test = cfg.testskip if cfg.testskip != 0 else 1
    train_rgbs, train_poses, train_ins = _split("train", 1)
    test_rgbs, test_poses, test_ins = _split("test", skip_test)

    images = np.concatenate([train_rgbs, test_rgbs], 0)
    poses = np.concatenate([train_poses, test_poses], 0)
    gt_labels = np.concatenate([train_ins, test_ins], 0).astype(np.int32)

    if cfg.resize:
        images = _resize_stack(images).astype(np.float32)
        gt_labels = _resize_stack(gt_labels)
        intr = np.loadtxt(os.path.join(basedir, "intrinsic", "intrinsic_depth.txt"))
    else:
        intr = np.loadtxt(os.path.join(basedir, "intrinsic", "intrinsic_color.txt"))

    i_train = np.arange(len(train_rgbs))
    i_test = np.arange(len(train_rgbs), len(images))

    ins_rgbs = load_palette(basedir)
    unique_labels = np.unique(gt_labels)
    ins_num = len(unique_labels) - 1          # drop the -1 unlabeled marker
    ins_rgbs = ins_rgbs[:ins_num]
    gt_labels[gt_labels == -1] = ins_num       # air remap (loader_scannet.py:153)

    H, W = images.shape[1:3]
    K = intr[:3, :3].astype(np.float32)

    crop_mask = crop_mask_for(H, W, cfg.crop_width, cfg.crop_height)
    ins_indices = selected_pixels(
        gt_labels[i_train], ins_num, crop_mask, cfg.weakly_value,
        rng=np.random.default_rng(cfg.seed),
    )

    return SceneData(
        images=images, poses=poses, H=int(H), W=int(W), K=K,
        i_train=i_train, i_test=i_test, gt_labels=gt_labels,
        ins_rgbs=ins_rgbs, ins_num=ins_num,
        ins_indices=ins_indices, crop_mask=crop_mask,
    )
