"""Pandas oracle: the reference's clustering semantics as a deterministic
fixpoint (FIXTURES.md §3, SURVEY.md §7.4.1).

The reference's `matching()` pass (`Name_Matching_opt.py:71-98,191-195`) is an
order-dependent approximation of connected components over the
"records-sharing-a-blocking-key" graph; the ground truth here is the exact
fixpoint (union-find), labeled by min(url) — the cleaner superset of the
reference's merges, per SURVEY §7.4.1 the correct golden target.

Bucketing mirrors `Name_Matching_opt.py:158-183`: matching runs inside
ownership-class buckets, with family (45, initial_class != 3) and juniors
(45, initial_class == 3) as *separate* buckets; both get address refinement
(`:115-129,225-227`); unknowns (-99) become singletons (`:230-232`).
"""

from __future__ import annotations

import pandas as pd

from fia_own_map_spark.config import CLASS_FAMILY, CLASS_UNKNOWN
from fia_own_map_spark.functions.combos import metaphone_keys_py
from fia_own_map_spark.functions.normalize import normalize_name_py


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            root = self.find(p)
            self.parent[x] = root
            return root
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id wins, mirroring the reference's lexicographic-min
            # tie-break (`Name_Matching_opt.py:92`)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def match_bucket(own_type: int, initial_class: int | None) -> str:
    if own_type == CLASS_FAMILY and initial_class == 3:
        return f"{own_type}J"
    return str(own_type)


def oracle_clusters(records: pd.DataFrame) -> pd.DataFrame:
    """records: url, owner1, owner2, own_type, initial_class, comb_addr.
    Returns (url, cluster_id) with cluster_id = min(url) per refined cluster.
    """
    df = records.copy()
    df["simple_owners"] = [
        normalize_name_py(o1, o2) for o1, o2 in zip(df["owner1"], df["owner2"])
    ]
    out: dict[str, str] = {}

    unknowns = df[df["own_type"] == CLASS_UNKNOWN]
    for url in unknowns["url"]:
        out[url] = url  # singleton (`Name_Matching_opt.py:230-232`)

    matchable = df[df["own_type"] != CLASS_UNKNOWN].copy()
    matchable["bucket"] = [
        match_bucket(t, ic) for t, ic in zip(matchable["own_type"], matchable["initial_class"])
    ]
    for bucket, grp in matchable.groupby("bucket"):
        uf = _UnionFind()
        key_to_first: dict[str, str] = {}
        for url, owners in zip(grp["url"], grp["simple_owners"]):
            uf.find(url)
            for k in metaphone_keys_py(owners.split(" ") if owners else []):
                if k in key_to_first:
                    uf.union(key_to_first[k], url)
                else:
                    key_to_first[k] = url
        # components labeled by min url
        comp: dict[str, list[str]] = {}
        for url in grp["url"]:
            comp.setdefault(uf.find(url), []).append(url)
        labels = {}
        for members in comp.values():
            lab = min(members)
            for u in members:
                labels[u] = lab
        # address refinement for family + juniors buckets
        if bucket.startswith(str(CLASS_FAMILY)):
            sub = grp.set_index("url")
            by_cluster: dict[str, list[str]] = {}
            for u, lab in labels.items():
                by_cluster.setdefault(lab, []).append(u)
            for lab, members in by_cluster.items():
                addrs = {sub.loc[u, "comb_addr"] for u in members}
                if len(addrs) > 1:
                    by_addr: dict[str, list[str]] = {}
                    for u in members:
                        by_addr.setdefault(sub.loc[u, "comb_addr"], []).append(u)
                    for urls in by_addr.values():
                        sub_lab = min(urls)
                        for u in urls:
                            labels[u] = sub_lab
        out.update(labels)

    return pd.DataFrame({"url": list(out.keys()), "cluster_id": list(out.values())})


def pairwise_prf(pred: pd.DataFrame, gold: pd.DataFrame) -> dict:
    """Exact pairwise precision/recall/F1 between two partitions of the same
    url set (label-invariant — computed from the contingency table, all pairs)."""
    merged = pred.merge(gold, on="url", suffixes=("_p", "_g"))

    def pairs(counts: pd.Series) -> int:
        return int((counts * (counts - 1) // 2).sum())

    both = pairs(merged.groupby(["cluster_id_p", "cluster_id_g"]).size())
    p_tot = pairs(merged.groupby("cluster_id_p").size())
    g_tot = pairs(merged.groupby("cluster_id_g").size())
    precision = both / p_tot if p_tot else 1.0
    recall = both / g_tot if g_tot else 1.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "pred_pairs": p_tot, "gold_pairs": g_tot, "common_pairs": both}


def labeled_pairs(
    gold: pd.DataFrame, records: pd.DataFrame, n_pairs: int = 2000, seed: int = 42
) -> pd.DataFrame:
    """FIXTURES.md §2: sampled labeled pairs — ~50% true matches, ~30%
    same-block hard negatives, ~20% cross-block negatives; is_match from the
    oracle partition."""
    import numpy as np

    rng = np.random.default_rng(seed)
    lab = gold.set_index("url")["cluster_id"]
    by_cluster = gold.groupby("cluster_id")["url"].apply(list)
    multi = [v for v in by_cluster if len(v) > 1]

    rows = []
    # true matches
    want_pos = n_pairs // 2
    while len(rows) < want_pos and multi:
        members = multi[int(rng.integers(0, len(multi)))]
        a, b = rng.choice(members, size=2, replace=False)
        if a != b:
            lo, hi = (a, b) if a < b else (b, a)
            rows.append((lo, hi, True))
    # negatives (same-bucket + random)
    urls = gold["url"].to_numpy()
    want = n_pairs
    attempts = 0
    while len(rows) < want and attempts < n_pairs * 50:
        attempts += 1
        a, b = rng.choice(urls, size=2, replace=False)
        if a == b or lab[a] == lab[b]:
            continue
        lo, hi = (a, b) if a < b else (b, a)
        rows.append((lo, hi, False))
    df = pd.DataFrame(rows, columns=["url_a", "url_b", "is_match"]).drop_duplicates(
        subset=["url_a", "url_b"]
    )
    return df
