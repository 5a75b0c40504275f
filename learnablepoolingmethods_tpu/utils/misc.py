"""Small host-side helpers (ref: utils.py)."""

from __future__ import annotations

from typing import List, Tuple


def get_list_of_feature_names_and_sizes(
    feature_names: str, feature_sizes: str
) -> Tuple[List[str], List[int]]:
    """Parse the ``--feature_names`` / ``--feature_sizes`` CSV flag pair.

    (ref: utils.py#GetListOfFeatureNamesAndSizes) — returns parallel lists and
    raises if their lengths differ.
    """
    names = [x.strip() for x in feature_names.split(",") if x.strip()]
    sizes = [int(x) for x in feature_sizes.split(",") if x.strip()]
    if len(names) != len(sizes):
        raise ValueError(
            f"length of feature_names ({len(names)}) != "
            f"length of feature_sizes ({len(sizes)})"
        )
    return names, sizes


def format_lines(video_ids, top_values, top_indices):
    """Kaggle CSV lines (ref: inference.py#format_lines).

    Lives here (flag-free module) so tests and tools can import it without
    pulling in the inference CLI's absl flag definitions; the C-speed twin
    is native/csv_formatter.cc (byte-identical output).
    """
    for vid, values, indices in zip(video_ids, top_values, top_indices):
        pairs = " ".join(
            f"{int(idx)} {float(val):.6f}" for idx, val in zip(indices, values)
        )
        yield f"{vid.decode() if isinstance(vid, bytes) else vid},{pairs}\n"


class InFlight:
    """Bounded dispatch-pipelining queue shared by the eval/inference CLIs.

    jax dispatch is async; callers enqueue per-batch payloads (host metadata
    + device result futures) and receive the OLDEST payload back once
    ``depth`` batches are in flight — blocking on device results only then,
    so host-side work overlaps device compute.  FIFO order is preserved.

        pipe = InFlight(depth)
        for batch in ...:
            done = pipe.add(payload)
            if done is not None: consume(done)
        for done in pipe.drain(): consume(done)
    """

    def __init__(self, depth: int):
        from collections import deque

        self._depth = max(int(depth), 1)
        self._q = deque()

    def add(self, item):
        self._q.append(item)
        if len(self._q) >= self._depth:
            return self._q.popleft()
        return None

    def drain(self):
        while self._q:
            yield self._q.popleft()
