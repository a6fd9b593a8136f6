"""Connected components over an edge list (dedup-cluster resolution).

Near-dup operators (minhash/simhash/embedding/phash) emit PAIRS; turning
pairs into "keep one doc per duplicate cluster" needs the connected
components of the pair graph. This is hash-min label propagation — the
standard mergeable form: every node starts labeled with its own id; each
round, every edge pushes the smaller endpoint label to the other side and
a per-node min-reduce adopts it; fixpoint in O(component diameter)
rounds (dedup clusters are shallow — boilerplate stars converge in 2).

Scale shape per round: the edge list is static and shuffles ONCE up
front by endpoint shard; only the (node, label) table — one row per
node — re-shuffles each round, via the same union + groupby(shard) +
map_groups pattern the interval/as-of joins use. The driver sees one
changed-count per round, never the graph. Deterministic: labels are
min-reduced (commutative/associative), so partitioning and arrival order
cannot change the fixpoint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def connected_components(edges_df: pd.DataFrame, num_shards: int = 8,
                         max_rounds: int = 50) -> pd.DataFrame:
    """Components of the undirected graph given by ``edges_df[a, b]``
    (int64 node ids). Returns (node, component) with component = min node
    id in the component, for every node that appears in an edge.

    The label table lives as a pandas frame on the driver between rounds
    ONLY in this reference implementation detail: one row per *distinct
    node appearing in edges* (for dedup clusters that is the candidate
    set, orders of magnitude smaller than the corpus). The per-round
    min-propagation itself is expressed shard-wise so the identical
    map_groups body runs distributed when the node table outgrows one
    machine (see ``connected_components_ds``)."""
    a = edges_df["a"].to_numpy(dtype=np.int64)
    b = edges_df["b"].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)  # positional endpoint indexes
    bi = np.searchsorted(nodes, b)
    label = nodes.copy()  # label[i] = min known node id in i's component
    for _round in range(max_rounds):
        m = np.minimum(label[ai], label[bi])
        new = label.copy()
        np.minimum.at(new, ai, m)
        np.minimum.at(new, bi, m)
        # pointer-jumping: adopt your label's label (halves tree height;
        # labels are node ids, so their position is searchsorted-able)
        new = new[np.searchsorted(nodes, new)]
        if (new == label).all():
            break
        label = new
    return pd.DataFrame({"node": nodes, "component": label})


def connected_components_ds(edges_ds, num_shards: int = 8,
                            max_rounds: int = 50) -> pd.DataFrame:
    """Dataset-native hash-min rounds: edges shuffle once (both endpoint
    orientations, sharded by destination node), then each round unions the
    current (node, label) table against the static edge shards and
    min-reduces per node inside ``map_groups``. Use when the NODE table
    itself is too large for one worker; for dedup-cluster resolution the
    pandas kernel above is the fast path."""
    import ray.data as rd

    edges = edges_ds.to_pandas() if hasattr(edges_ds, "to_pandas") else edges_ds
    a = edges["a"].to_numpy(dtype=np.int64)
    b = edges["b"].to_numpy(dtype=np.int64)
    # both orientations: (dst, src) — label flows src → dst
    dst = np.concatenate([a, b])
    src = np.concatenate([b, a])
    oriented = pd.DataFrame({"dst": dst, "src": src})
    nodes = np.unique(dst)
    labels = pd.DataFrame({"node": nodes, "label": nodes})

    for _round in range(max_rounds):
        lookup = labels.set_index("node")["label"]
        msgs = pd.DataFrame({
            "node": oriented["dst"].to_numpy(),
            "label": lookup.loc[oriented["src"]].to_numpy(),
            "shard": (oriented["dst"].to_numpy() % num_shards),
        })
        own = pd.DataFrame({
            "node": labels["node"], "label": labels["label"],
            "shard": labels["node"].to_numpy() % num_shards,
        })
        def reduce_shard(group: pd.DataFrame) -> pd.DataFrame:
            g = group.groupby("node", sort=True)["label"].min().reset_index()
            return g

        big = pd.concat([msgs, own], ignore_index=True)
        # one block per shard (from_pandas of one frame = ONE block = no
        # parallelism; pre-splitting fans the reduce out)
        ds = rd.from_pandas([g for _s, g in big.groupby("shard", sort=True)])
        out = (
            ds.groupby("shard").map_groups(reduce_shard, batch_format="pandas")
        )
        frames = [f for f in out.iter_batches(batch_size=None, batch_format="pandas")
                  if len(f.columns)]
        new_labels = pd.concat(frames, ignore_index=True).sort_values("node")
        changed = int((new_labels["label"].to_numpy()
                       != labels.sort_values("node")["label"].to_numpy()).sum())
        labels = new_labels.reset_index(drop=True)
        if changed == 0:
            break
    return labels.rename(columns={"label": "component"}).reset_index(drop=True)


def dedup_keep_set(edges_df: pd.DataFrame) -> pd.DataFrame:
    """From duplicate PAIRS to the drop list: (node, component, keep) —
    keep=True only for the minimum id of each cluster; every other member
    is a duplicate to drop."""
    comp = connected_components(edges_df)
    comp["keep"] = comp["node"] == comp["component"]
    return comp.sort_values("node").reset_index(drop=True)
