"""GraphRAG / RAPTOR — the deterministic, non-LLM core of the
reference's two enrichment subsystems, as Ray Data pipelines.

The reference builds a knowledge graph per corpus (entity extraction →
merged co-occurrence graph → Leiden communities → community reports:
``graphrag/general/{graph_extractor,index,leiden,
community_reports_extractor}.py``) and a RAPTOR summary tree per
document's chunk set (layered cluster-then-summarize:
``rag/raptor.py:33-137``). Both drive every step that matters through
an LLM (entity typing, report prose, cluster summaries) — excluded
here by the north rule. What this module ships is everything AROUND
the LLM calls, with deterministic stand-ins at the two call sites:

- entity extraction → salience heuristic (length-gated tokens, per-doc
  top-k by term frequency) — rerun-stable and SQL-expressible, so the
  whole graph build is hash-checkable;
- community detection → exact min-label propagation (connected
  components) instead of randomized Leiden — deterministic and
  recursive-CTE-oracle-able; the reference's leiden.py itself falls
  back to connected components for stability
  (``stable_largest_connected_component``);
- community report / cluster summary → extractive statistics (top
  entity by weighted degree; cluster centroid) instead of LLM prose.

Scale shapes:
- ``entity_graph``: one streaming pass; each batch emits PRE-AGGREGATED
  (src, dst, weight) pair partials (per-doc entity set is capped at
  ``per_doc_cap``, so the per-doc pair fanout is ≤ C(cap,2) — the
  quadratic is bounded by design, exactly the reference's
  max-gleanings cap); a bucket-mode combiner tree sums them. The
  shuffle moves (term, term, int) rows, never text.
- ``graph_communities``: the edge set is vocabulary²-bounded (entity
  pairs, not documents), so it rides the same spilled-edge-partition
  min-label propagation as the dedup CC (``dedup._cc_label_propagation``
  — O(E) work distributed, labels O(V) driver-side).
- ``raptor_tree``: the reference builds one tree PER document's chunk
  set (task granularity in ``run_raptor``), so the distributed shape
  is one groupby(label) shuffle co-locating each group, then a pure
  numpy layered clustering per group — worker memory is bounded by the
  largest group, nothing driver-side but the final (layer, node,
  parent) rows.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_EMPTY_EDGES = pd.DataFrame({"src": pd.array([], dtype="string"),
                             "dst": pd.array([], dtype="string"),
                             "weight": pd.array([], dtype="int64")})


def _docs(sf_dir: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def _doc_entities(text: str, min_len: int, per_doc_cap: int) -> list[str]:
    """Deterministic entity stand-in: the doc's ``per_doc_cap`` most
    frequent tokens of length ≥ ``min_len`` (ties break lexicographic),
    returned sorted. The graph_extractor's LLM prompt plays this role
    in the reference (entity list per chunk, capped by gleanings)."""
    counts: dict[str, int] = {}
    for w in text.lower().split():
        if len(w) >= min_len:
            counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return sorted(k for k, _ in top[:per_doc_cap])


def entity_graph(sf_dir: str, min_len: int = 4,
                 per_doc_cap: int = 12) -> pd.DataFrame:
    """The merged entity co-occurrence graph (reference:
    ``graph_extractor`` per chunk + ``update_graph`` merge,
    ``graphrag/general/index.py:120``): undirected edges (src < dst)
    weighted by the number of documents whose entity sets contain both.
    Hash-strict against a window-SQL oracle."""
    from ..stages.agg import combine_partials

    def pair_partials(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for text in batch["text"].to_pylist():
            names = _doc_entities(text, min_len, per_doc_cap)
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    p = (names[i], names[j])
                    counts[p] = counts.get(p, 0) + 1
        keys = list(counts)
        return pa.table({
            "src": pa.array([p[0] for p in keys], type=pa.string()),
            "dst": pa.array([p[1] for p in keys], type=pa.string()),
            "weight": pa.array(list(counts.values()), type=pa.int64())})

    parts = _docs(sf_dir, ["text"]).map_batches(pair_partials,
                                                batch_format="pyarrow")
    # bucket mode: the pair keyspace is vocabulary²-bounded but can
    # exceed one combine task at web vocab sizes
    out = combine_partials(parts, ["src", "dst"], {"weight": "sum"},
                           mode="bucket").to_pandas()
    if out.empty or "src" not in out.columns:
        return _EMPTY_EDGES.copy()
    out["weight"] = out["weight"].astype("int64")
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def graph_communities(sf_dir: str, min_len: int = 4,
                      per_doc_cap: int = 12) -> pd.DataFrame:
    """Communities over the entity graph: exact connected components by
    min-label propagation, community id = lexicographically smallest
    member entity. The deterministic stand-in for Leiden level-0
    (``graphrag/general/leiden.py:72`` — whose own preprocessing is
    ``stable_largest_connected_component``). Output (entity, community)
    for every entity incident to ≥1 edge, sorted."""
    from .dedup import _cc_label_propagation

    edges = entity_graph(sf_dir, min_len, per_doc_cap)
    empty = pd.DataFrame({"entity": pd.array([], dtype="string"),
                          "community": pd.array([], dtype="string")})
    if edges.empty:
        return empty
    # densify entity names → sorted index so the propagated MIN int
    # label maps back to the lexicographically-min entity name
    names = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {n: i for i, n in enumerate(names)}
    pairs = pd.DataFrame({
        "id_a": [idx[s] for s in edges["src"]],
        "id_b": [idx[d] for d in edges["dst"]]})
    cc = _cc_label_propagation(pairs)
    return (pd.DataFrame({
        "entity": [names[i] for i in cc["doc_id"]],
        "community": [names[i] for i in cc["cluster_id"]]})
        .sort_values("entity").reset_index(drop=True))


def community_reports(sf_dir: str, min_len: int = 4,
                      per_doc_cap: int = 12) -> pd.DataFrame:
    """Extractive community report — the deterministic columns of the
    reference's LLM community report
    (``community_reports_extractor.py``: entity/edge rollups feed the
    prompt; the prose is the LLM part, excluded): per community its
    size, internal edge count, total edge weight, and the top entity by
    weighted degree (tie → lexicographically smaller). Both inputs are
    OUTPUT-sized (entity vocab, not corpus), so the final join is a
    driver-side pandas pass — the same boundedness argument as the
    dedup pair lists."""
    edges = entity_graph(sf_dir, min_len, per_doc_cap)
    comm = graph_communities(sf_dir, min_len, per_doc_cap)
    empty = pd.DataFrame({
        "community": pd.array([], dtype="string"),
        "n_entities": pd.array([], dtype="int64"),
        "n_edges": pd.array([], dtype="int64"),
        "total_weight": pd.array([], dtype="int64"),
        "top_entity": pd.array([], dtype="string"),
        "top_degree": pd.array([], dtype="int64")})
    if comm.empty:
        return empty
    cmap = dict(zip(comm["entity"], comm["community"]))
    # weighted degree per entity (each edge is intra-community by the
    # CC definition, so either endpoint's community labels the edge)
    deg: dict[str, int] = {}
    for s, d, w in zip(edges["src"], edges["dst"], edges["weight"]):
        deg[s] = deg.get(s, 0) + int(w)
        deg[d] = deg.get(d, 0) + int(w)
    rows: dict[str, dict] = {}
    for e, c in cmap.items():
        r = rows.setdefault(c, {"n_entities": 0, "n_edges": 0,
                                "total_weight": 0,
                                "top_entity": None, "top_degree": -1})
        r["n_entities"] += 1
        de = deg.get(e, 0)
        if de > r["top_degree"] or (de == r["top_degree"]
                                    and e < r["top_entity"]):
            r["top_entity"], r["top_degree"] = e, de
    for s, _, w in zip(edges["src"], edges["dst"], edges["weight"]):
        r = rows[cmap[s]]
        r["n_edges"] += 1
        r["total_weight"] += int(w)
    comms = sorted(rows)
    return pd.DataFrame({
        "community": comms,
        "n_entities": pd.array([rows[c]["n_entities"] for c in comms],
                               dtype="int64"),
        "n_edges": pd.array([rows[c]["n_edges"] for c in comms],
                            dtype="int64"),
        "total_weight": pd.array([rows[c]["total_weight"] for c in comms],
                                 dtype="int64"),
        "top_entity": [rows[c]["top_entity"] for c in comms],
        "top_degree": pd.array([rows[c]["top_degree"] for c in comms],
                               dtype="int64")})


# ------------------------------------------------------------- RAPTOR ---

def _kmeans_small(m: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd's over a small in-group matrix: centroids
    init from the first k rows (the kmeans_clusters convention), ties
    break to the lowest cluster, empty clusters keep their centroid.
    The stand-in for the reference's UMAP+GMM-BIC pick
    (``rag/raptor.py:69-78``), which is seeded-random and
    non-reproducible across library versions."""
    cents = m[:k].copy()
    assign = np.zeros(len(m), dtype=np.int64)
    for _ in range(iters):
        d2 = (-2.0 * (m @ cents.T)
              + (cents * cents).sum(axis=1))
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            sel = m[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
    return assign


def raptor_tree(sf_dir: str, max_cluster: int = 8,
                iters: int = 5) -> pd.DataFrame:
    """RAPTOR tree construction (``rag/raptor.py:33-137``) minus the
    two LLM/embedding calls: per label group (the reference builds one
    tree per document's chunk set — same granularity), cluster the
    current layer's vectors into ⌈n/max_cluster⌉ clusters, append one
    summary node per cluster whose vector is the cluster MEAN (the
    deterministic stand-in for embed(LLM-summary)), and recurse until
    a single root. Output one row per node: (label, layer, node_id,
    parent_id, n_members); leaves are layer 0 with node_id = vec_id,
    internal node_id = cluster index within its layer, root parent_id
    = -1. Shape: one groupby(label) shuffle; per-group numpy only."""
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "label", "embedding"])

    _EMPTY = pd.DataFrame({
        "label": pd.array([], dtype="int64"),
        "layer": pd.array([], dtype="int64"),
        "node_id": pd.array([], dtype="int64"),
        "parent_id": pd.array([], dtype="int64"),
        "n_members": pd.array([], dtype="int64")})

    def build_tree(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        label = int(g["label"].iloc[0])
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        node_ids = g["vec_id"].to_numpy(np.int64)
        n_members = np.ones(len(g), dtype=np.int64)
        rows = {"layer": [], "node_id": [], "parent_id": [],
                "n_members": []}
        layer = 0
        while len(node_ids) > 1:
            k = max(1, -(-len(node_ids) // max_cluster))  # ceil div
            assign = _kmeans_small(m, k, iters)
            # re-densify: empty clusters vanish, survivors keep order
            live = np.unique(assign)
            remap = {int(c): i for i, c in enumerate(live)}
            rows["layer"].extend([layer] * len(node_ids))
            rows["node_id"].extend(node_ids.tolist())
            rows["parent_id"].extend(remap[int(a)] for a in assign)
            rows["n_members"].extend(n_members.tolist())
            nm = np.empty((len(live), m.shape[1]), dtype=np.float64)
            nmem = np.empty(len(live), dtype=np.int64)
            for i, c in enumerate(live):
                sel = assign == c
                nm[i] = m[sel].mean(axis=0)
                nmem[i] = int(n_members[sel].sum())
            m, n_members = nm, nmem
            node_ids = np.arange(len(live), dtype=np.int64)
            layer += 1
        rows["layer"].append(layer)
        rows["node_id"].append(int(node_ids[0]))
        rows["parent_id"].append(-1)
        rows["n_members"].append(int(n_members[0]))
        return pd.DataFrame({
            "label": pd.array([label] * len(rows["layer"]),
                              dtype="int64"),
            "layer": pd.array(rows["layer"], dtype="int64"),
            "node_id": pd.array(rows["node_id"], dtype="int64"),
            "parent_id": pd.array(rows["parent_id"], dtype="int64"),
            "n_members": pd.array(rows["n_members"], dtype="int64")})

    df = (emb.groupby("label")
          .map_groups(build_tree, batch_format="pandas").to_pandas())
    if df.empty:
        return _EMPTY
    return (df.sort_values(["label", "layer", "node_id"])
            .reset_index(drop=True))


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (two-row DP) — matches DuckDB's
    ``levenshtein()`` so the candidate gate is SQL-reproducible."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def entity_resolution_candidates(sf_dir: str, min_len: int = 4,
                                 per_doc_cap: int = 12) -> pd.DataFrame:
    """The DETERMINISTIC half of the reference's entity resolution
    (``graphrag/entity_resolution.py:94-96,215-223``): candidate
    same-entity pairs over the graph's node vocabulary, gated by
    ``is_similarity`` — English names within edit distance
    ⌊min(len)/2⌋, or any pair sharing > 1 distinct character. The
    reference then asks an LLM which candidates actually merge (north-
    rule excluded); the candidate set itself is pure string logic and
    hash-strict against DuckDB's levenshtein + list_intersect.

    Scale: the node vocabulary is entity-dimension-sized (not corpus),
    so the all-pairs scan is bounded exactly like the reference's
    per-type ``itertools.combinations`` — documented driver-side.
    Output (ent_a, ent_b, lev, n_common_chars), sorted."""
    import re

    edges = entity_graph(sf_dir, min_len, per_doc_cap)
    empty = pd.DataFrame({
        "ent_a": pd.array([], dtype="object"),
        "ent_b": pd.array([], dtype="object"),
        "lev": pd.array([], dtype="int64"),
        "n_common_chars": pd.array([], dtype="int64")})
    if edges.empty:
        return empty
    vocab = sorted(set(edges["src"]) | set(edges["dst"]))
    ascii_alpha = re.compile(r"^[A-Za-z]+$")
    is_en = {v: bool(ascii_alpha.match(v)) for v in vocab}
    chars = {v: set(v) for v in vocab}
    rows = {"ent_a": [], "ent_b": [], "lev": [], "n_common_chars": []}
    for i in range(len(vocab)):
        a = vocab[i]
        for j in range(i + 1, len(vocab)):
            b = vocab[j]
            common = len(chars[a] & chars[b])
            # the O(len·len) DP only runs for pairs that can emit: a
            # non-English pair with ≤1 shared char fails both gates no
            # matter its edit distance (common > 1 pairs still need
            # lev for the output row)
            if common <= 1 and not (is_en[a] and is_en[b]):
                continue
            lev = _levenshtein(a, b)
            if (is_en[a] and is_en[b]
                    and lev <= min(len(a), len(b)) // 2) or common > 1:
                rows["ent_a"].append(a)
                rows["ent_b"].append(b)
                rows["lev"].append(lev)
                rows["n_common_chars"].append(common)
    if not rows["ent_a"]:
        return empty
    return pd.DataFrame({
        "ent_a": rows["ent_a"], "ent_b": rows["ent_b"],
        "lev": pd.array(rows["lev"], dtype="int64"),
        "n_common_chars": pd.array(rows["n_common_chars"],
                                   dtype="int64")})


# ------------------------------------------------ modularity communities ---

def _louvain(n: int, edges: list[tuple[int, int, float]],
             max_levels: int = 10, max_passes: int = 20
             ) -> list[int]:
    """Deterministic weighted Louvain: greedy modularity local moves in
    ascending node order (ties → smallest community label), then graph
    aggregation, repeated until no level merges anything. Fully
    order-stable — the property the reference goes out of its way to
    force on graspologic's leiden via ``_stabilize_graph`` + a fixed
    seed (graphrag/general/leiden.py:17-55,75). Returns the final
    community id per ORIGINAL node (ids are arbitrary ints, stable)."""
    mapping = list(range(n))          # original node → current supernode
    cur_n = n
    cur_edges = [(a, b, float(w)) for a, b, w in edges]
    for _level in range(max_levels):
        # adjacency (no self), self-loop weights, degrees
        adj: list[dict[int, float]] = [dict() for _ in range(cur_n)]
        self_w = [0.0] * cur_n
        for a, b, w in cur_edges:
            if a == b:
                self_w[a] += w
                continue
            adj[a][b] = adj[a].get(b, 0.0) + w
            adj[b][a] = adj[b].get(a, 0.0) + w
        k = [sum(adj[i].values()) + 2.0 * self_w[i] for i in range(cur_n)]
        m2 = sum(k)
        if m2 == 0:
            break
        comm = list(range(cur_n))
        sigma = k[:]                  # Σ degree per community
        moved_any = False
        for _pass in range(max_passes):
            moved = False
            for i in range(cur_n):
                ci = comm[i]
                # weight from i to each neighboring community
                wto: dict[int, float] = {}
                for j, w in adj[i].items():
                    wto[comm[j]] = wto.get(comm[j], 0.0) + w
                sigma[ci] -= k[i]
                best_c, best_gain = ci, (wto.get(ci, 0.0)
                                         - k[i] * sigma[ci] / m2)
                for c in sorted(wto):
                    if c == ci:
                        continue
                    gain = wto[c] - k[i] * sigma[c] / m2
                    if gain > best_gain + 1e-12 or (
                            abs(gain - best_gain) <= 1e-12
                            and c < best_c):
                        best_c, best_gain = c, gain
                comm[i] = best_c
                sigma[best_c] += k[i]
                if best_c != ci:
                    moved = moved_any = True
            if not moved:
                break
        if not moved_any:
            break
        # relabel communities densely by smallest member id (stable)
        label = {}
        for i in range(cur_n):
            c = comm[i]
            if c not in label or i < label[c]:
                label[c] = i
        order = sorted(set(label.values()))
        dense = {c: order.index(label[c]) for c in label}
        comm = [dense[c] for c in comm]
        mapping = [comm[m] for m in mapping]
        # aggregate
        agg: dict[tuple[int, int], float] = {}
        for a, b, w in cur_edges:
            ca, cb = comm[a], comm[b]
            key = (ca, cb) if ca <= cb else (cb, ca)
            agg[key] = agg.get(key, 0.0) + w
        cur_edges = [(a, b, w) for (a, b), w in sorted(agg.items())]
        cur_n = len(order)
        if cur_n == len(comm) and all(c == i for i, c in enumerate(comm)):
            break
    return mapping


def modularity_communities(sf_dir: str, min_len: int = 4,
                           per_doc_cap: int = 12) -> pd.DataFrame:
    """Modularity communities over the entity graph — the deterministic
    stand-in for the reference's hierarchical Leiden partitioning
    (graphrag/general/leiden.py:72 ``hierarchical_leiden`` over the
    stabilized graph; its own determinism machinery is the fixed seed +
    node/edge ordering). Weighted Louvain (_louvain) over the
    aggregated (src, dst, weight) entity edges; community id = the
    lexicographically smallest member entity, like graph_communities.

    Scale shape: the EDGE AGGREGATION is distributed (entity_graph:
    per-batch partials over the corpus); the partitioner runs on the
    aggregate, whose size is vocabulary²-bounded and corpus-
    independent — the same contract as the reference, which loads the
    whole entity graph into networkx. Output (entity, community),
    sorted; rows-only (iterative algorithm), invariants + determinism
    pinned in pytest."""
    edges = entity_graph(sf_dir, min_len, per_doc_cap)
    empty = pd.DataFrame({"entity": pd.array([], dtype="string"),
                          "community": pd.array([], dtype="string")})
    if edges.empty:
        return empty
    names = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {nm: i for i, nm in enumerate(names)}
    e = [(idx[s], idx[d], float(w))
         for s, d, w in zip(edges["src"], edges["dst"], edges["weight"])]
    comm = _louvain(len(names), e)
    # community label = lexicographically smallest member entity
    best: dict[int, str] = {}
    for i, c in enumerate(comm):
        if c not in best or names[i] < best[c]:
            best[c] = names[i]
    return (pd.DataFrame({
        "entity": pd.array(names, dtype="string"),
        "community": pd.array([best[c] for c in comm], dtype="string")})
        .sort_values("entity").reset_index(drop=True))
