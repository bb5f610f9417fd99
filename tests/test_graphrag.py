"""GraphRAG / RAPTOR deterministic cores: entity co-occurrence graph,
community detection, extractive reports, layered cluster tree.
Reference semantics: graphrag/general/{graph_extractor,leiden,
community_reports_extractor}.py, rag/raptor.py:33-137 (minus the LLM
calls, excluded by the north rule)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}),
        str(d / "documents.parquet"))
    return str(d)


def test_entity_graph_hand_counts(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.graphrag import entity_graph

    sf = _write_docs(tmp_path, [
        "alpha beta gamma xx",          # xx too short → not an entity
        "alpha beta",                   # co-occur again
        "gamma delta",
        "solo",                         # 1 entity → no pairs
        "",                             # empty → nothing
    ])
    df = entity_graph(sf)
    got = {(r.src, r.dst): r.weight for r in df.itertuples()}
    assert got == {("alpha", "beta"): 2, ("alpha", "gamma"): 1,
                   ("beta", "gamma"): 1, ("delta", "gamma"): 1}


def test_entity_cap_keeps_most_frequent(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.graphrag import entity_graph

    # 13 distinct entities, 'zzzz' repeated: cap 12 drops exactly the
    # lexicographically-last singleton ('wm12'), keeps frequent 'zzzz'
    words = [f"wm{i:02d}" for i in range(13)]
    text = " ".join(words) + " zzzz zzzz"
    df = entity_graph(_write_docs(tmp_path, [text]))
    ents = sorted(set(df["src"]) | set(df["dst"]))
    assert "zzzz" in ents and "wm12" not in ents
    assert len(ents) == 12
    assert len(df) == 12 * 11 // 2


def test_graph_communities_two_components(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.graphrag import graph_communities

    sf = _write_docs(tmp_path, [
        "apple banana", "banana cherry",   # component {apple,banana,cherry}
        "delta echo",                      # component {delta,echo}
    ])
    df = graph_communities(sf)
    got = dict(zip(df["entity"], df["community"]))
    assert got == {"apple": "apple", "banana": "apple", "cherry": "apple",
                   "delta": "delta", "echo": "delta"}


def test_community_reports_top_entity_and_rollups(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.graphrag import community_reports

    # banana has weighted degree 3 (2 from apple edge, 1 from cherry);
    # apple 2, cherry 1 → top is banana
    sf = _write_docs(tmp_path, [
        "apple banana", "apple banana", "banana cherry",
        "delta echo",
    ])
    df = community_reports(sf).set_index("community")
    a = df.loc["apple"]
    assert (a.n_entities, a.n_edges, a.total_weight) == (3, 2, 3)
    assert (a.top_entity, a.top_degree) == ("banana", 3)
    d = df.loc["delta"]
    assert (d.n_entities, d.n_edges, d.total_weight) == (2, 1, 1)
    assert d.top_entity == "delta"  # degree tie 1-1 → lex smaller


def test_raptor_tree_invariants_and_determinism(ray_session):
    from ragflow_core16_ray.pipelines.graphrag import raptor_tree

    t1 = raptor_tree(SF, max_cluster=8)
    t2 = raptor_tree(SF, max_cluster=8)
    pd.testing.assert_frame_equal(t1, t2)  # rerun-deterministic

    emb = pq.read_table(SF + "/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    for label, g in t1.groupby("label"):
        n_leaves = (emb["label"] == label).sum()
        leaves = g[g["layer"] == 0]
        assert len(leaves) == n_leaves
        assert set(leaves["node_id"]) == set(
            emb.loc[emb["label"] == label, "vec_id"])
        assert (leaves["n_members"] == 1).all()
        # exactly one root, parent -1, carrying every leaf
        root = g[g["parent_id"] == -1]
        assert len(root) == 1
        assert int(root["n_members"].iloc[0]) == n_leaves
        # every non-root parent exists in the next layer, and each
        # layer's member counts are conserved
        top = int(g["layer"].max())
        for layer in range(top):
            cur = g[g["layer"] == layer]
            nxt = g[g["layer"] == layer + 1]
            assert set(cur["parent_id"]) <= set(nxt["node_id"])
            assert cur["n_members"].sum() == nxt["n_members"].sum()
            # layers shrink (the reference's while end-start > 1 loop)
            assert len(nxt) < len(cur) or len(cur) == 1


def test_raptor_tree_single_vector_group(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.graphrag import raptor_tree

    d = tmp_path / "emb1"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array([7], type=pa.int64()),
        "label": pa.array([3], type=pa.int64()),
        "embedding": pa.array([np.arange(4, dtype=np.float64).tolist()],
                              type=pa.list_(pa.float64()))}),
        str(d / "embeddings.parquet"))
    t = raptor_tree(str(d))
    assert len(t) == 1
    r = t.iloc[0]
    assert (r.layer, r.node_id, r.parent_id, r.n_members) == (0, 7, -1, 1)


def test_entity_resolution_candidates_gates(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.graphrag import (
        _levenshtein, entity_resolution_candidates)

    # vocab: {alpha, alphb, beta2} — alpha/alphb: lev 1 ≤ 2 (edit
    # gate, both English); alphb/beta2: share {a,b} (char gate; the
    # digit makes beta2 non-English so the edit gate is off);
    # alpha/beta2: share only {a} and edit gate off → NOT a candidate
    sf = _write_docs(tmp_path, ["alpha alphb", "alphb beta2",
                                "alpha beta2"])
    df = entity_resolution_candidates(sf)
    got = {(r.ent_a, r.ent_b): (r.lev, r.n_common_chars)
           for r in df.itertuples()}
    assert got == {("alpha", "alphb"): (1, 4),
                   ("alphb", "beta2"): (5, 2)}
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("", "abc") == 3


def test_entity_resolution_excludes_dissimilar(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.graphrag import (
        entity_resolution_candidates)

    # wxyz / qrst: lev 4 > min(4,4)//2, share 0 chars → no candidates
    sf = _write_docs(tmp_path, ["wxyz qrst"])
    df = entity_resolution_candidates(sf)
    assert df.empty


def test_louvain_separates_cliques():
    """Two 4-cliques joined by one bridge edge → exactly the two
    cliques; deterministic across runs."""
    from ragflow_core16_ray.pipelines.graphrag import _louvain

    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 1.0))
    edges.append((0, 4, 1.0))  # bridge
    comm = _louvain(8, edges)
    assert comm == _louvain(8, edges)  # deterministic
    assert len({comm[i] for i in range(4)}) == 1
    assert len({comm[i] for i in range(4, 8)}) == 1
    assert comm[0] != comm[4]


def test_louvain_weight_binds():
    """A heavy edge pulls a node into the neighboring community even
    when unit edges tie it elsewhere."""
    from ragflow_core16_ray.pipelines.graphrag import _louvain

    # triangle 0-1-2 (unit), node 3 tied to 2 by weight 10, to 0 by 1
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
             (2, 3, 10.0), (0, 3, 1.0)]
    comm = _louvain(4, edges)
    assert comm[3] == comm[2]


def test_louvain_singleton_and_empty():
    from ragflow_core16_ray.pipelines.graphrag import _louvain

    assert _louvain(3, []) == [0, 1, 2]
    assert _louvain(1, [(0, 0, 2.0)]) == [0]


def test_modularity_communities_refine_components(ray_session):
    """Louvain communities nest inside connected components and carry
    the same naming convention (id = lex-min member)."""
    from ragflow_core16_ray.pipelines.graphrag import (
        graph_communities, modularity_communities)

    sf = "/root/testdata/sf0.001"
    cc = graph_communities(sf).set_index("entity")["community"]
    mc = modularity_communities(sf)
    assert list(mc.columns) == ["entity", "community"]
    assert set(mc["entity"]) == set(cc.index)
    # nesting: two entities in the same louvain community share a CC
    by_comm = mc.groupby("community")["entity"].apply(list)
    for members in by_comm:
        assert len({cc[m] for m in members}) == 1
    # naming: community id is a member, and the lex-smallest one
    for comm_id, members in by_comm.items():
        assert comm_id == min(members)
    # determinism
    assert mc.equals(modularity_communities(sf))
