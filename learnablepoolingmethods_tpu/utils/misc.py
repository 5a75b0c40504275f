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
