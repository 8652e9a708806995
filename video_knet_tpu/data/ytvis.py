"""YouTube-VIS dataset (COCO-VID json) + submission formatter.

Behavioral rebuild of mmtrack's CocoVID parsing as used by the reference
(mmtrack/datasets/parsers/coco_video_parser.py:9, coco_video_dataset.py:14,105,
youtube_vis_dataset.py:70-200): videos -> ordered frame lists, per-frame instance
annotations keyed by a video-level instance id, clip sampling for training
(num_ref_imgs=5, frame_range [-2, 2]), whole-video loading for test, and
`format_results` producing the YT-VIS submission json (per-track RLE segmentations,
majority-vote category by summed score, mean score).
"""

from __future__ import annotations

import json
import os
import zipfile
from dataclasses import dataclass

import numpy as np

from video_knet_tpu.data.polygon import polygons_to_mask
from video_knet_tpu.data.rle import decode_mask, encode_mask


@dataclass
class VideoRecord:
    video_id: int
    frames: list[dict]  # coco image dicts in frame order
    anns_by_frame: list[list[dict]]  # per frame


class YouTubeVISDataset:
    """Reader for the COCO-VID json produced by tools/dataset/youtubevis2coco.py."""

    def __init__(self, ann_file: str, img_root: str | None = None):
        with open(ann_file) as f:
            data = json.load(f)
        self.categories = {c["id"]: c["name"] for c in data.get("categories", [])}
        self.cat_ids = sorted(self.categories)
        self.img_root = img_root

        vids: dict[int, list[dict]] = {}
        for img in data["images"]:
            vids.setdefault(img["video_id"], []).append(img)
        for v in vids.values():
            v.sort(key=lambda im: im.get("frame_id", im["id"]))

        anns_by_img: dict[int, list[dict]] = {}
        for ann in data.get("annotations", []):
            anns_by_img.setdefault(ann["image_id"], []).append(ann)

        self.videos = [
            VideoRecord(
                video_id=vid,
                frames=frames,
                anns_by_frame=[anns_by_img.get(im["id"], []) for im in frames],
            )
            for vid, frames in sorted(vids.items())
        ]

    def __len__(self) -> int:
        return len(self.videos)

    def sample_clip(
        self,
        video_idx: int,
        rng: np.random.RandomState,
        *,
        num_frames: int = 5,
        frame_range: tuple[int, int] = (-2, 2),
        method: str = "uniform",
        filter_key_img: bool = True,
    ) -> list[int]:
        """Sample clip frame indices: a key frame + refs within frame_range
        (coco_video_dataset.py:105-230 ref_img_sampling).

        `uniform` samples refs without replacement from the window (key frame
        excluded when filter_key_img); `bilateral_uniform` samples
        min(num_refs//2, side size) from each side of the key
        (coco_video_dataset.py:190-202), with the short side's deficit filled
        from the long side's remaining frames. The reference returns a SHORT
        ref list near clip boundaries; static shapes force a full clip here,
        so any remaining deficit is padded with the nearest in-window non-key
        frames (duplicates), and the key frame repeats only for single-frame
        videos — never training on key-duplicated clips when real neighbor
        frames exist.
        """
        v = self.videos[video_idx]
        n = len(v.frames)
        key = int(rng.randint(0, n))
        num_refs = num_frames - 1
        lo = max(0, key + frame_range[0])
        hi = min(n - 1, key + frame_range[1])
        window = [i for i in range(lo, hi + 1)
                  if not (filter_key_img and i == key)]
        refs: list[int] = []
        if method == "bilateral_uniform":
            left = [i for i in window if i <= key]
            right = [i for i in window if i > key]
            half = num_refs // 2
            take_left = min(half, len(left))
            take_right = min(num_refs - take_left, len(right))
            take_left = min(num_refs - take_right, len(left))
            refs += [int(i) for i in rng.choice(left, take_left, replace=False)]
            refs += [int(i) for i in rng.choice(right, take_right, replace=False)]
        else:
            take = min(num_refs, len(window))
            refs = [int(i) for i in rng.choice(window, take, replace=False)]
        if len(refs) < num_refs and window:
            near = sorted(window, key=lambda i: abs(i - key))
            k = 0
            while len(refs) < num_refs:
                refs.append(int(near[k % len(near)]))
                k += 1
        refs += [key] * (num_refs - len(refs))  # single-frame video only
        return [key] + sorted(refs)

    def clip_gt_arrays(
        self, video_idx: int, frame_idxs: list[int], *, max_insts: int,
        hw: tuple[int, int] | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Build fixed-slot GT tubes (masks [G, T, H, W], labels [G], valid [G])."""
        v = self.videos[video_idx]
        t = len(frame_idxs)
        if hw is None:
            im0 = v.frames[0]
            hw = (im0["height"], im0["width"])
        inst_slots: dict[int, int] = {}
        masks = np.zeros((max_insts, t, *hw), np.float32)
        labels = np.zeros((max_insts,), np.int32)
        valid = np.zeros((max_insts,), bool)
        for ti, fi in enumerate(frame_idxs):
            for ann in v.anns_by_frame[fi]:
                iid = ann.get("instance_id", ann["id"])
                if iid not in inst_slots:
                    if len(inst_slots) >= max_insts:
                        continue
                    inst_slots[iid] = len(inst_slots)
                    labels[inst_slots[iid]] = self.cat_ids.index(ann["category_id"])
                    valid[inst_slots[iid]] = True
                seg = ann.get("segmentation")
                if seg is None:
                    continue
                if isinstance(seg, dict):
                    m = decode_mask(seg).astype(np.float32)
                else:  # COCO polygon list -> rasterize (ext/ytvos.py:266-270)
                    m = polygons_to_mask(seg, *hw).astype(np.float32)
                masks[inst_slots[iid], ti] = m[: hw[0], : hw[1]]
        return masks, labels, valid


def format_vis_results(
    per_video_tracks: list[list[dict]],
    out_dir: str,
    *,
    make_zip: bool = True,
) -> str:
    """Write the YT-VIS submission (youtube_vis_dataset.py:106-200).

    per_video_tracks: for each video, a list of track dicts
      {video_id, track_id, frame_scores {frame: score}? or score, category_votes
       {cat: summed score} or category_id, segmentations: [rle or None per frame]}.
    Tracks with explicit per-frame votes get majority-vote category (argmax of
    summed scores) and mean score.
    """
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for tracks in per_video_tracks:
        for tr in tracks:
            if "category_votes" in tr:
                cat = max(tr["category_votes"].items(), key=lambda kv: kv[1])[0]
            else:
                cat = tr["category_id"]
            if "frame_scores" in tr:
                score = float(np.mean(list(tr["frame_scores"].values())))
            else:
                score = float(tr["score"])
            results.append(
                {
                    "video_id": tr["video_id"],
                    "category_id": int(cat),
                    "score": score,
                    "segmentations": tr["segmentations"],
                }
            )
    json_path = os.path.join(out_dir, "results.json")
    with open(json_path, "w") as f:
        json.dump(results, f)
    if make_zip:
        zip_path = os.path.join(out_dir, "submission_file.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
            z.write(json_path, arcname="results.json")
    return json_path


def tracks_from_prediction(
    video_id: int,
    masks: np.ndarray,  # [T, K, H, W] logits or probs
    labels: np.ndarray,  # [K]
    scores: np.ndarray,  # [K]
    cat_ids: list[int],
    *,
    mask_thr: float = 0.5,
    score_thr: float = 0.0,
) -> list[dict]:
    """Convert one clip decode into submission track dicts (RLE per frame)."""
    t, k = masks.shape[:2]
    binary = masks > (0.0 if masks.min() < 0 else mask_thr)  # logits vs probs
    tracks = []
    for j in range(k):
        if scores[j] < score_thr:
            continue
        segs = []
        for ti in range(t):
            m = binary[ti, j]
            segs.append(encode_mask(m) if m.any() else None)
        tracks.append(
            {
                "video_id": video_id,
                "track_id": j,
                "category_id": cat_ids[int(labels[j])],
                "score": float(scores[j]),
                "segmentations": segs,
            }
        )
    return tracks
