"""Offline DAVIS J&F benchmark evaluation.

Re-design of the vendored davis2017 package's semi-supervised path
(/root/reference/evaluation/davis2017/evaluation.py:19-322, davis.py:91-115,
results.py:22-31) plus the CSV/report writer
(basic_evaluator.py:271-328). Pure numpy/PIL — no torch, no pandas.
"""

from __future__ import annotations

import csv
import os
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from swem_tpu.eval.metrics import boundary_f_frames, jaccard, statistics

VOID_LABEL = 255


class DavisGT:
    """DAVIS ground-truth reader (davis.py:14-115)."""

    def __init__(self, root: str, year: str = "2017", subset: str = "val",
                 resolution: str = "480p", sequences="all",
                 task: str = "semi-supervised"):
        self.root = root
        self.year = str(year)
        self.img_path = os.path.join(root, "JPEGImages", resolution)
        # the unsupervised task has its own annotation folder (davis.py:33)
        ann = "Annotations" if task == "semi-supervised" else "Annotations_unsupervised"
        self.mask_path = os.path.join(root, ann, resolution)
        imageset = os.path.join(root, "ImageSets", self.year, f"{subset}.txt")
        if sequences == "all":
            with open(imageset) as f:
                self.sequences = [ln.strip() for ln in f if ln.strip()]
        else:
            self.sequences = list(sequences)

    def get_all_masks(self, seq: str) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        """Returns (per-object masks (N, T, H, W) bool, void (T, H, W), ids).

        255 -> void; DAVIS-2016 collapses all ids to 1 (davis.py:91-110).
        Objects are defined by the ids present in frame 0.
        """
        paths = sorted(glob(os.path.join(self.mask_path, seq, "*.png")))
        masks = np.stack([np.array(Image.open(p), np.uint8) for p in paths])
        ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        void = masks == VOID_LABEL
        masks = np.where(void, 0, masks)
        if self.year == "2016":
            masks = (masks > 0).astype(np.uint8)
        num_objects = int(masks[0].max())
        obj_ids = np.arange(1, num_objects + 1)
        sep = masks[None] == obj_ids[:, None, None, None]
        return sep, void, ids


def read_result_masks(res_path: str, seq: str, mask_ids: Sequence[str],
                      n_objects: int, shape=None) -> np.ndarray:
    """Read predicted PNGs into per-object bool masks (results.py:14-43).

    Missing/short predictions are zero-padded like the reference
    (evaluation.py:52-55). ``shape`` is the fallback frame shape when even
    the first prediction is absent.
    """
    first_path = next(
        (os.path.join(res_path, seq, f"{m}.png") for m in mask_ids
         if os.path.exists(os.path.join(res_path, seq, f"{m}.png"))),
        None,
    )
    if first_path is not None:
        shape = np.array(Image.open(first_path), np.uint8).shape
    elif shape is None:
        raise FileNotFoundError(f"no predictions for sequence {seq} in {res_path}")
    out = np.zeros((n_objects, len(mask_ids)) + tuple(shape), bool)
    for t, mid in enumerate(mask_ids):
        p = os.path.join(res_path, seq, f"{mid}.png")
        if not os.path.exists(p):
            continue
        m = np.array(Image.open(p), np.uint8)
        for n in range(n_objects):
            out[n, t] = m == (n + 1)
    return out


def read_proposal_masks(res_path: str, seq: str, mask_ids: Sequence[str]) -> np.ndarray:
    """Read predictions as N-proposal masks (unsupervised task): one channel
    per distinct id present in the PNGs."""
    frames = []
    max_id = 0
    for mid in mask_ids:
        p = os.path.join(res_path, seq, f"{mid}.png")
        m = np.array(Image.open(p), np.uint8) if os.path.exists(p) else None
        frames.append(m)
        if m is not None:
            max_id = max(max_id, int(m.max()))
    shape = next((m.shape for m in frames if m is not None), None)
    if shape is None:
        raise FileNotFoundError(f"no proposal PNGs for sequence {seq} in {res_path}")
    out = np.zeros((max_id, len(mask_ids)) + shape, bool)
    for t, m in enumerate(frames):
        if m is None:
            continue
        for n in range(max_id):
            out[n, t] = m == (n + 1)
    return out


def evaluate_unsupervised(
    gt: np.ndarray, proposals: np.ndarray, void: Optional[np.ndarray] = None,
    metric=("J", "F"), max_n_proposals: int = 20,
) -> Tuple[np.ndarray, np.ndarray]:
    """Hungarian-matched multi-proposal evaluation (evaluation.py:64-83).

    gt: (Ngt, T, H, W) bool; proposals: (Np, T, H, W) bool.
    Returns per-gt-object (J, F) series after optimal proposal assignment.
    """
    from scipy.optimize import linear_sum_assignment

    if proposals.shape[0] > max_n_proposals:
        raise ValueError(
            f"{proposals.shape[0]} proposals exceed the maximum {max_n_proposals}"
        )
    if proposals.shape[0] < gt.shape[0]:
        pad = np.zeros((gt.shape[0] - proposals.shape[0],) + proposals.shape[1:], bool)
        proposals = np.concatenate([proposals, pad], axis=0)
    n_p, n_g, T = proposals.shape[0], gt.shape[0], gt.shape[1]
    j = np.zeros((n_p, n_g, T))
    f = np.zeros((n_p, n_g, T))
    for g in range(n_g):
        for p in range(n_p):
            if "J" in metric:
                j[p, g] = jaccard(gt[g], proposals[p], void)
            if "F" in metric:
                f[p, g] = boundary_f_frames(gt[g], proposals[p], void)
    if "J" in metric and "F" in metric:
        score = (j.mean(-1) + f.mean(-1)) / 2.0
    else:
        score = j.mean(-1) if "J" in metric else f.mean(-1)
    rows, cols = linear_sum_assignment(-score)
    return j[rows, cols], f[rows, cols]


class DavisEvaluation:
    """DAVIS evaluation (evaluation.py:265-322): semi-supervised (first/last
    frames excluded) or unsupervised (Hungarian proposal matching).
    Per-object J and F series are reduced with (mean, recall, decay).
    """

    def __init__(self, davis_root: str, year: str = "2017", gt_set: str = "val",
                 task: str = "semi-supervised"):
        self.task = task
        self.dataset = DavisGT(davis_root, year=year, subset=gt_set, task=task)

    def evaluate(self, res_path: str, metric=("J", "F")) -> Dict:
        res: Dict[str, Dict] = {
            m: {"M": [], "R": [], "D": [], "M_per_object": {}, "per_obj_frame": {}}
            for m in metric
        }
        for seq in self.dataset.sequences:
            gt, void, ids = self.dataset.get_all_masks(seq)
            if self.task == "semi-supervised":
                gt, ids = gt[:, 1:-1], ids[1:-1]
                pred = read_result_masks(res_path, seq, ids, gt.shape[0],
                                         shape=gt.shape[2:])
                j_series = f_series = None
            else:
                proposals = read_proposal_masks(res_path, seq, ids)
                j_series, f_series = evaluate_unsupervised(gt, proposals, void, metric)
            for n in range(gt.shape[0]):
                seq_name = f"{seq}_{n + 1}"
                if "J" in metric:
                    j = j_series[n] if j_series is not None else jaccard(gt[n], pred[n])
                    M, R, D = statistics(j)
                    res["J"]["M"].append(M)
                    res["J"]["R"].append(R)
                    res["J"]["D"].append(D)
                    res["J"]["M_per_object"][seq_name] = M
                    res["J"]["per_obj_frame"][seq_name] = j
                if "F" in metric:
                    f = f_series[n] if f_series is not None else boundary_f_frames(gt[n], pred[n])
                    M, R, D = statistics(f)
                    res["F"]["M"].append(M)
                    res["F"]["R"].append(R)
                    res["F"]["D"].append(D)
                    res["F"]["M_per_object"][seq_name] = M
                    res["F"]["per_obj_frame"][seq_name] = f
        return res


def write_reports(metrics_res: Dict, save_dir: str, eval_set: str,
                  logger=None, per_object_csv: bool = False) -> Dict[str, float]:
    """Global + per-sequence CSVs, per-object per-frame log rows, stdout
    tables (basic_evaluator.py:271-328).

    ``per_object_csv`` additionally writes the per-object per-frame J/F
    series to ``per-object_results-<set>.csv`` (one row per object per
    metric); the log rows match the reference's
    ``Per obj per frame J, <seq>_<obj>:[...]`` lines
    (basic_evaluator.py:311-316) either way.
    """
    J, F = metrics_res["J"], metrics_res["F"]
    final_mean = (np.mean(J["M"]) + np.mean(F["M"])) / 2.0
    g_names = ["J&F-Mean", "J-Mean", "J-Recall", "J-Decay", "F-Mean", "F-Recall", "F-Decay"]
    g_vals = [final_mean, np.mean(J["M"]), np.mean(J["R"]), np.mean(J["D"]),
              np.mean(F["M"]), np.mean(F["R"]), np.mean(F["D"])]

    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, f"global_results-{eval_set}.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(g_names)
        w.writerow([f"{v:.3f}" for v in g_vals])

    with open(os.path.join(save_dir, f"per-sequence_results-{eval_set}.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Sequence", "J-Mean", "F-Mean"])
        for name in J["M_per_object"]:
            w.writerow([name, f"{J['M_per_object'][name]:.3f}", f"{F['M_per_object'][name]:.3f}"])

    # per-object per-frame series (basic_evaluator.py:311-316)
    if logger is not None:
        for name in J["per_obj_frame"]:
            logger.info(
                f"Per obj per frame J, {name}:"
                f"{np.asarray(J['per_obj_frame'][name]).tolist()}")
            logger.info(
                f"Per obj per frame F, {name}:"
                f"{np.asarray(F['per_obj_frame'][name]).tolist()}")
    if per_object_csv:
        path = os.path.join(save_dir, f"per-object_results-{eval_set}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Object", "Metric", "Frames..."])
            for name in J["per_obj_frame"]:
                w.writerow([name, "J"] + [
                    f"{v:.5f}" for v in np.asarray(J["per_obj_frame"][name])])
                w.writerow([name, "F"] + [
                    f"{v:.5f}" for v in np.asarray(F["per_obj_frame"][name])])

    table = " ".join(f"{n}: {v:.3f}" for n, v in zip(g_names, g_vals))
    msg = f"--- Global results for {eval_set} ---\n{table}"
    print(msg)
    if logger is not None:
        logger.info(msg)
    return dict(zip(g_names, [float(v) for v in g_vals]))
