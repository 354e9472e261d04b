"""Reading-order merge of per-component texts into block texts.

Semantics-parity reimplementation of the reference's
``OCRModel.merge_single_result`` (ref: ocr_translate/models/ocr.py:68-147)
over plain tuples instead of ORM objects.  Given the text + geometry of the
*single* components detected inside each *merged* block, assemble the block
text in reading order:

* a block is treated as vertical when the language is a vertical script and
  ``height * 1.3 > width`` (ref ocr.py:103-105);
* component centers (y-centers for horizontal, x-centers for vertical) are
  greedily clustered into lines/columns with threshold = mean extent / 1.5
  (ref ocr.py:107-134);
* lines are read top-to-bottom, columns right-to-left; within a line chunks
  go left-to-right, within a column top-to-bottom (ref ocr.py:135-143);
* no-space languages join with '' instead of ' ' (ref ocr.py:94).

Golden behavior: a jittered 3x3 grid labeled 1..9 reads '1 2 3 4 5 6 7 8 9'
horizontally and '369258147' vertically (ref tests/test_models.py:379-435).

In the Spark engine this runs inside the extraction Arrow stage (block
ordering of DOM/layout fragments, e.g. PDF text chunks); it is numpy over
in-batch arrays, never a shuffle.
"""

from __future__ import annotations

import numpy as np

# ref: ocr_translate/models/ocr.py:40-41
NO_SPACE_LANGUAGES = ("ja", "zh", "zht", "lo", "my")
VERTICAL_LANGS = ("ja", "zh", "zht", "ko")


def greedy_center_clusters(centers: np.ndarray, threshold: float) -> np.ndarray:
    """Greedy 1-NN clustering of 1-D centers (ref ocr.py:117-134).

    Returns (cluster_labels, cluster_centers): each center joins the nearest
    existing cluster seed if within ``threshold``, else seeds a new cluster.
    Cluster centers stay pinned at their seed value (first member), exactly
    as the reference never updates classifiers after creation.
    """
    seeds: list[float] = []
    labels = np.empty(len(centers), dtype=np.int64)
    for idx, cen in enumerate(centers):
        if not seeds:
            seeds.append(cen)
            labels[idx] = 0
            continue
        arr = np.asarray(seeds)
        nearest = int(np.argmin(np.abs(arr - cen)))
        if abs(arr[nearest] - cen) < threshold:
            labels[idx] = nearest
        else:
            seeds.append(cen)
            labels[idx] = len(seeds) - 1
    return labels, np.asarray(seeds, dtype=np.float64)


def order_components(
    lbrt: np.ndarray, vertical: bool
) -> np.ndarray:
    """Indices of components in reading order.

    ``lbrt`` is an (n, 4) float array of (left, bottom, right, top).
    Horizontal: cluster on y-centers, lines ascending (top→bottom in the
    reference's coordinate frame), chunks by left ascending.  Vertical:
    cluster on x-centers, columns descending (right→left), chunks by top
    ascending.  (ref ocr.py:107-143)
    """
    left, bottom, right, top = lbrt[:, 0], lbrt[:, 1], lbrt[:, 2], lbrt[:, 3]
    if vertical:
        threshold = float(np.average(right - left)) / 1.5
        centers = (left + right) / 2.0
        chunk_key = top
    else:
        threshold = float(np.average(top - bottom)) / 1.5
        centers = (bottom + top) / 2.0
        chunk_key = left

    labels, seeds = greedy_center_clusters(centers, threshold)
    line_order = np.argsort(seeds, kind="stable")
    if vertical:
        line_order = line_order[::-1]

    ordered: list[int] = []
    for line in line_order:
        members = np.where(labels == line)[0]
        ordered.extend(members[np.argsort(chunk_key[members], kind="stable")])
    return np.asarray(ordered, dtype=np.int64)


def merge_single_result(
    lang: str,
    texts: list[str],
    singles_lbrt: list[tuple[float, float, float, float]],
    singles_merged_id: list,
    merged_blocks: list[tuple[object, tuple[float, float, float, float]]],
) -> list[str]:
    """Assemble each merged block's text from its components in reading order.

    Args:
        lang: iso1 language code.
        texts: text of each single component.
        singles_lbrt: (l, b, r, t) of each single component.
        singles_merged_id: id of the merged block each component belongs to.
        merged_blocks: ordered list of (merged_id, (l, b, r, t)).

    Returns one merged string per entry of ``merged_blocks``
    (ref ocr.py:68-147).
    """
    by_block: dict = {}
    for text, box, mid in zip(texts, singles_lbrt, singles_merged_id):
        by_block.setdefault(mid, []).append((text, box))

    sep = "" if lang in NO_SPACE_LANGUAGES else " "
    results: list[str] = []
    for mid, (l, b, r, t) in merged_blocks:
        members = by_block[mid]
        geom = np.asarray([box for _, box in members], dtype=np.float64)
        width, height = r - l, t - b
        vertical = lang in VERTICAL_LANGS and height * 1.3 > width
        order = order_components(geom, vertical)
        results.append(sep.join(members[i][0] for i in order))
    return results
