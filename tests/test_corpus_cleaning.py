"""PII scrubbing, corpus-level boilerplate line removal and source mixing
weights.

The driver's sf corpora are digit-free single-line word soup, so their
hash-strict oracle runs exercise plumbing but match trivially. The strong
checks live HERE: a PII-rich / boilerplate-rich fixture corpus (same
schema as documents.parquet) is written to tmp and BOTH the Ray pipeline
and the committed DuckDB oracle SQL run over it — asserting the
engine/oracle hash parity exactly where the regex/df semantics have
something to disagree about (RE2 vs re.ASCII boundaries, sequential
redaction order, distinct-doc line df, empty-doc md5)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_corpus(tmp_path, texts, sources=None):
    import os
    os.makedirs(str(tmp_path), exist_ok=True)
    df = pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": sources or [f"src{i % 3}" for i in range(len(texts))],
        "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(sql).df()


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


PII_TEXTS = [
    "contact alice.smith+spam@example-mail.org or bob@sub.domain.co today",
    "server at 10.0.255.3 fell over; backup is 192.168.1.1.",
    "call 555-123-4567 or 555.9876.5432 now",
    # email whose local part looks like an IP: sequential order means the
    # email pass consumes it and the IP pass must NOT count it again
    "route 1.2.3.4@relay.net then ping 1.2.3.4",
    # CJK adjacent to digits: re.ASCII \b must agree with RE2's ASCII \b
    "编号555-123-4567联系",
    "no pii here at all",
    "",
    "overlong octets 1234.5.6.7 should not match as an IP",
]


def test_pii_scrub_counts_and_redaction(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import pii_scrub

    sf = _write_corpus(tmp_path, PII_TEXTS)
    got = pii_scrub(sf).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "n_emails"] == 2
    assert got.loc[1, "n_ips"] == 2 and got.loc[1, "n_emails"] == 0
    assert got.loc[2, "n_phones"] == 2
    # the email pass already consumed the dotted-quad local part
    assert got.loc[3, "n_emails"] == 1 and got.loc[3, "n_ips"] == 1
    # ASCII \b fires between CJK and digits in BOTH engines
    assert got.loc[4, "n_phones"] == 1
    assert got.loc[5].tolist()[:3] == [0, 0, 0]
    assert got.loc[7, "n_ips"] == 0


def test_pii_scrub_matches_oracle_on_pii_rich_corpus(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.text_analysis import pii_scrub

    sf = _write_corpus(tmp_path, PII_TEXTS)
    got = _canon(pii_scrub(sf).to_pandas())
    want = _canon(_oracle(sf, e.oracle_sql()["pii_scrub"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


BOILER_TEXTS = [
    "Cookie notice: we use cookies\nreal article one\nAll rights reserved",
    "Cookie notice: we use cookies\nreal article two\nAll rights reserved",
    "Cookie notice: we use cookies\nreal article three\nAll rights reserved",
    # df=2 footer stays (threshold is 3); short separator lines always stay
    "rare footer here\n--\nbody text alpha",
    "rare footer here\n--\nbody text beta",
    # repeated WITHIN one doc counts once toward df
    "Cookie notice: we use cookies\nCookie notice: we use cookies",
    "",
]


def test_boilerplate_removal_drops_hot_lines_only(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.dedup import boilerplate_removal

    sf = _write_corpus(tmp_path, BOILER_TEXTS)
    got = (boilerplate_removal(sf).to_pandas()
           .set_index("doc_id").sort_index())
    # docs 0-2: cookie line (df=4) and footer (df=3) both removed
    assert got.loc[0, "n_removed"] == 2 and got.loc[0, "n_lines"] == 3
    # df=2 footer and the short '--' separator survive
    assert got.loc[3, "n_removed"] == 0
    # doc 5: both copies of the hot line removed
    assert got.loc[5, "n_removed"] == 2
    import hashlib
    assert got.loc[5, "clean_fp"] == hashlib.md5(b"").hexdigest()
    assert (got.loc[1, "clean_fp"]
            == hashlib.md5("real article two".encode()).hexdigest())


def test_boilerplate_removal_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.dedup import boilerplate_removal

    sf = _write_corpus(tmp_path, BOILER_TEXTS)
    got = _canon(boilerplate_removal(sf).to_pandas())
    want = _canon(_oracle(sf, e.oracle_sql()["boilerplate_removal"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_mix_weights_temperature(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import source_mix_weights

    # skewed mix: src0 carries 6 of 9 docs
    sf = _write_corpus(tmp_path, ["doc %d" % i for i in range(9)],
                       sources=["src0"] * 6 + ["src1"] * 2 + ["src2"])
    got = source_mix_weights(sf).set_index("source")
    assert int(got["weight_q"].sum()) == pytest.approx(1_000_000, abs=2)
    # alpha<1 compresses the mix: the heavy source is UNDER-sampled
    # relative to its document share
    w0 = got.loc["src0", "weight_q"] / 1e6
    share0 = got.loc["src0", "n_docs"] / got["n_docs"].sum()
    assert w0 < share0
    # and ordering is still preserved
    assert got.loc["src0", "weight_q"] > got.loc["src1", "weight_q"]


def test_source_mix_weights_uniform_on_balanced(ray_session):
    from ragflow_core16_ray.pipelines.text_analysis import source_mix_weights

    got = source_mix_weights(SF)
    assert got["weight_q"].nunique() == 1  # sf0.001 sources are balanced


GOPHER_TEXTS = [
    # passes everything: 50+ real words with stopwords
    ("the quick brown fox jumps over that lazy dog and keeps running "
     * 6).strip(),
    # too short (8 words) — fails pass_len only
    "the cat and the hat have a nap",
    # no stopwords: word soup
    "alpha beta gamma delta " * 15,
    # symbol soup: words without any alphabetic character
    "$$$ %%% 123 !!! ### " * 12,
    "",
]


def test_gopher_filter_rules(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import gopher_filter

    sf = _write_corpus(tmp_path, GOPHER_TEXTS)
    got = gopher_filter(sf).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "pass_gopher"] == 1
    r1 = got.loc[1]
    assert (r1["pass_len"], r1["pass_stop"]) == (0, 1)
    assert got.loc[2, "pass_stop"] == 0 and got.loc[2, "pass_len"] == 1
    # symbol soup: alphabetic-word fraction rule fires
    assert got.loc[3, "pass_alpha"] == 0 and got.loc[3, "n_alpha_words"] == 0
    # empty doc: zero counters, mean-length/alpha vacuously true, len fails
    r4 = got.loc[4]
    assert r4["n_words"] == 0 and r4["pass_len"] == 0
    assert r4["pass_gopher"] == 0


def test_gopher_filter_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.text_analysis import gopher_filter

    sf = _write_corpus(tmp_path, GOPHER_TEXTS)
    got = _canon(gopher_filter(sf).to_pandas())
    want = _canon(_oracle(sf, e.oracle_sql()["gopher_filter"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


SCRIPT_TEXTS = [
    "plain ascii words 123",
    "中文和かなと한글 mixed with latin",
    "Привет мир — Cyrillic plus an em dash",
    "tabs\tand\nnewlines\r\nhere",
    "",
]


def test_script_stats_counts(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import script_stats

    sf = _write_corpus(tmp_path, SCRIPT_TEXTS)
    got = script_stats(sf).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "n_digit"] == 3 and got.loc[0, "n_cjk"] == 0
    # 中文和 (3 han) かなと (3 kana) 한글 (2 hangul)
    assert got.loc[1, "n_cjk"] == 8
    assert got.loc[2, "n_cyrillic"] == len("Приветмир")
    assert got.loc[2, "n_other"] >= 1  # the em dash
    assert got.loc[3, "n_space"] == 4
    # partition property: classes + other == total
    parts = got[["n_latin", "n_digit", "n_cjk", "n_cyrillic", "n_space",
                 "n_other"]].sum(axis=1)
    assert (parts == got["n_total"]).all()


def test_script_stats_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.text_analysis import script_stats

    sf = _write_corpus(tmp_path, SCRIPT_TEXTS)
    got = _canon(script_stats(sf).to_pandas())
    want = _canon(_oracle(sf, e.oracle_sql()["script_stats"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ten words that form one exact passage, pasted into several docs
_BP = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
PASSAGE_TEXTS = [
    _BP + " unique tail zero",                       # canonical (doc 0, j 0)
    "lead-in words one two three four five six seven " + _BP,
    _BP + " " + _BP,                                 # twice in one doc
    "totally unrelated words that repeat nothing at all here",
    "short",                                         # sub-passage tail only
]


def test_dedup_passages_keeps_canonical_only(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.dedup import dedup_passages

    sf = _write_corpus(tmp_path, PASSAGE_TEXTS)
    got = (dedup_passages(sf).to_pandas()
           .set_index("doc_id").sort_index())
    import hashlib
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 0 holds the canonical occurrence: nothing removed
    assert got.loc[0, "n_removed"] == 0
    assert got.loc[0, "clean_fp"] == md5(PASSAGE_TEXTS[0])
    # doc 1's copy (j=0 but doc_id>0... passage starts at word 9? no: the
    # lead-in is 9 words, so its only full passage is words 0-9 which
    # differs from _BP) — compute expectations structurally instead:
    # doc 2 contains _BP twice; the canonical lives in doc 0, so BOTH
    # copies are removed
    assert got.loc[2, "n_passages"] == 2 and got.loc[2, "n_removed"] == 2
    assert got.loc[2, "clean_fp"] == md5("")
    # unique docs untouched
    assert got.loc[3, "n_removed"] == 0
    assert got.loc[3, "clean_fp"] == md5(PASSAGE_TEXTS[3])
    # sub-passage doc: no passages, tail survives verbatim
    assert got.loc[4, "n_passages"] == 0
    assert got.loc[4, "clean_fp"] == md5("short")


def test_dedup_passages_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.dedup import dedup_passages

    sf = _write_corpus(tmp_path, PASSAGE_TEXTS)
    got = _canon(dedup_passages(sf).to_pandas())
    want = _canon(_oracle(sf, e.oracle_sql()["dedup_passages"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _local_bpe(texts, n_merges, max_types=20_000):
    """Single-process replica of train_bpe: plain dict word count, same
    (count desc, word asc) type cutoff, same shared merge loop."""
    from collections import Counter

    from ragflow_core16_ray.pipelines.text_analysis import _bpe_merge_loop

    wc = Counter()
    for t in texts:
        wc.update(t.split())
    vocab = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_types]
    types = [(tuple(w) + ("</w>",), c) for w, c in vocab]
    return _bpe_merge_loop(types, n_merges)


def test_train_bpe_matches_local_replica(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import train_bpe

    texts = ["the theme there then " * 5, "other anthem the " * 8,
             "банан the theme", ""]
    sf = _write_corpus(tmp_path, texts)
    got = train_bpe(sf, n_merges=12)
    want = _local_bpe(texts, 12)
    assert (list(zip(got["left"], got["right"], got["pair_count"]))
            == want)
    # 'the' dominates; (h,e) and (t,h) tie on count and the lexicographic
    # tie-break picks (h,e) first — pinning the determinism rule
    assert (got.loc[0, "left"], got.loc[0, "right"]) == ("h", "e")


def test_train_bpe_matches_local_on_sf(ray_session):
    import pyarrow.parquet as pq_

    from ragflow_core16_ray.pipelines.text_analysis import train_bpe

    texts = pq_.read_table(SF + "/documents.parquet",
                           columns=["text"])["text"].to_pylist()
    got = train_bpe(SF, n_merges=15)
    want = _local_bpe(texts, 15)
    assert (list(zip(got["left"], got["right"], got["pair_count"]))
            == want)


def test_bpe_token_counts_bounds(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import (bpe_encode_word,
                                                            bpe_token_counts,
                                                            train_bpe)

    texts = ["aaa aaa aaa bbb", "aaa xyz"]
    sf = _write_corpus(tmp_path, texts)
    got = (bpe_token_counts(sf, n_merges=20).to_pandas()
           .set_index("doc_id").sort_index())
    # with 20 merges on this tiny vocab, 'aaa' collapses to one token
    merges = train_bpe(sf, n_merges=20)
    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}
    assert bpe_encode_word("aaa", ranks) == ["aaa</w>"]
    # per-doc count == sum of per-word encode lengths (replica check)
    for did, text in enumerate(texts):
        want = sum(len(bpe_encode_word(w, ranks)) for w in text.split())
        assert got.loc[did, "n_bpe_tokens"] == want


def test_top_words_cms_bounds_vs_exact(ray_session):
    from ragflow_core16_ray.pipelines.text_analysis import (top_words,
                                                            top_words_cms)

    exact = top_words(SF, k=10)
    approx = top_words_cms(SF, k=10)
    exact_counts = dict(zip(exact["word"], exact["cnt"]))
    approx_counts = dict(zip(approx["word"], approx["est_cnt"]))
    # CMS never underestimates
    for w, c in exact_counts.items():
        assert w in approx_counts and approx_counts[w] >= c
    # the heavy head is correctly identified on this corpus
    assert approx["word"].iloc[0] == exact["word"].iloc[0]
    assert set(exact["word"]) <= set(approx["word"])


CLEAN_TEXTS = [
    # survives all four stages (50+ words, stopwords, no dup/boiler/pii)
    ("the quick brown fox jumps over that lazy dog and keeps running "
     * 6).strip(),
    # identical copy: exact dedup keeps only min doc_id
    ("the quick brown fox jumps over that lazy dog and keeps running "
     * 6).strip(),
    # PII + boilerplate + enough body to survive the Gopher rules
    ("Cookie banner we always show here\n"
     + ("the striped cat sat on that warm mat and would not move today "
        * 6).strip()
     + "\nreach me at alice@example.com"),
    "Cookie banner we always show here\nshort junk",
    "Cookie banner we always show here\nmore short junk",
    # word soup: killed by the stop-word rule
    "alpha beta gamma delta " * 20,
]


def test_run_clean_end_to_end_and_resume(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.clean import run_clean

    sf = _write_corpus(tmp_path / "in", CLEAN_TEXTS)
    out = str(tmp_path / "out")
    m = run_clean(sf, out)
    assert m["n_in"] == 6
    assert m["n_pii_redactions"] == 1          # the email
    assert m["n_lines_removed"] == 3           # cookie banner in docs 2-4
    # survivors: doc 0 (dup 1 dropped by exact dedup) and doc 2
    assert m["n_out"] == 2
    final = pq.read_table(m["output"]).to_pandas().set_index("doc_id")
    assert set(final.index) == {0, 2}
    assert "<EMAIL>" in final.loc[2, "text"]
    assert "Cookie banner" not in final.loc[2, "text"]
    # doc 0's duplicated text: only its first 10-word passage occurrences
    # survive passage dedup corpus-wide (doc 1 contributed nothing new)

    # resume: a second run skips every stage (manifests present)
    t_stats = {s: (tmp_path / "out" / f"_{s}.json").stat().st_mtime
               for s in ("pii", "boiler", "passage", "final")}
    m2 = run_clean(sf, out)
    assert m2["n_out"] == m["n_out"]
    for s, t in t_stats.items():
        assert (tmp_path / "out" / f"_{s}.json").stat().st_mtime == t


def test_source_mix_sample_matches_local_replica(ray_session):
    """The deterministic epoch draw equals a local pandas replica of the
    integer cutoff rule, and the per-source sample composition tracks
    the temperature weights (expected picks per source = weight_q/1e6 of
    the sample, modulo hash noise)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ragflow_core16_ray.functions.hashing import md5_hex
    from ragflow_core16_ray.pipelines.text_analysis import (
        source_mix_sample, source_mix_weights)

    sf = "/root/testdata/sf0.001"
    got = (source_mix_sample(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    w = source_mix_weights(sf)
    n_tot = int(w["n_docs"].sum())
    budget = n_tot * 1 // 2
    cutoff = {s: (int(wq) * budget * 16**8) // (1_000_000 * int(n))
              for s, n, wq in zip(w["source"], w["n_docs"], w["weight_q"])}
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    keep = [int(md5_hex(str(d))[:8], 16) < cutoff[s]
            for d, s in zip(docs["doc_id"], docs["source"])]
    want = docs[keep].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # composition tracks the weights: every source is represented and a
    # heavier-weighted source never yields fewer picks than a 3x-lighter one
    picks = got["source"].value_counts()
    wq = w.set_index("source")["weight_q"]
    assert set(picks.index) == set(wq.index)
    # the half-corpus budget makes this a strict, weight-shaped subset
    assert 0 < len(got) < n_tot
    for a in wq.index:
        for b in wq.index:
            if wq[a] >= 3 * wq[b]:
                assert picks[a] > picks[b]


def test_source_mix_epochs_expected_budget(ray_session):
    """The repetition plan's expected row total equals the epoch budget
    (E[sum n_repeats] = B) and matches a local replica of the integer
    rule exactly."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ragflow_core16_ray.functions.hashing import md5_hex
    from ragflow_core16_ray.pipelines.text_analysis import (
        source_mix_epochs, source_mix_weights)

    sf = "/root/testdata/sf0.001"
    got = (source_mix_epochs(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    w = source_mix_weights(sf)
    n_tot = int(w["n_docs"].sum())
    budget = n_tot * 2
    q = {s: (int(wq) * budget * 16**8) // (1_000_000 * int(n))
         for s, n, wq in zip(w["source"], w["n_docs"], w["weight_q"])}
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    reps = [q[s] // 16**8 + (int(md5_hex(str(d))[:8], 16) < q[s] % 16**8)
            for d, s in zip(docs["doc_id"], docs["source"])]
    docs["n_repeats"] = pd.array(reps, dtype="int64")
    want = (docs[docs["n_repeats"] > 0]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # hash-draw noise is small at 500 docs: total within 15% of budget
    total = int(got["n_repeats"].sum())
    assert abs(total - budget) <= 0.15 * budget


def test_source_mix_epochs_skewed_updown(ray_session, tmp_path):
    """On a skewed mix the plan must UP-sample the light sources (more
    expected repeats per doc) relative to the heavy one."""
    from ragflow_core16_ray.pipelines.text_analysis import source_mix_epochs

    sf = _write_corpus(tmp_path, ["doc %d" % i for i in range(24)],
                       sources=["src0"] * 18 + ["src1"] * 4 + ["src2"] * 2)
    got = source_mix_epochs(sf).to_pandas()
    mean = got.groupby("source")["n_repeats"].sum().div(
        pd.Series({"src0": 18, "src1": 4, "src2": 2}))
    assert mean["src2"] > mean["src1"] > mean["src0"]


def test_lang_length_quantiles_matches_local(ray_session):
    """Grouped lower-rule quantiles from the distributed histogram must
    equal a direct local computation per language."""
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.text_analysis import (
        lang_length_quantiles)

    got = lang_length_quantiles(SF)
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["lang", "n_chars"]).to_pandas()
    for _, row in got.iterrows():
        vals = sorted(docs.loc[docs["lang"] == row["lang"], "n_chars"])
        need = -(-int(row["q"]) * len(vals) // 100)
        assert row["value"] == vals[need - 1]
    assert set(got["lang"]) == set(docs["lang"])


def test_sliding_chunks_overlap_and_tail(ray_session, tmp_path):
    """Sliding windows: stride overlap, kept short tail, empty-doc
    omission, exact-multiple boundary."""
    from ragflow_core16_ray.pipelines.text_analysis import sliding_chunks

    texts = ["w " * 500,        # 500 tokens: windows at 0/192/384
             "w " * 384,        # exact multiple: windows at 0/192
             "one two",         # shorter than one window
             ""]                # no chunks
    sf = _write_corpus(tmp_path, [t.strip() for t in texts])
    got = sliding_chunks(sf).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    rows = [tuple(r) for r in got.itertuples(index=False)]
    assert rows == [
        (0, 0, 0, 256), (0, 1, 192, 256), (0, 2, 384, 116),
        (1, 0, 0, 256), (1, 1, 192, 192),
        (2, 0, 0, 2),
    ]


def test_collocations_integer_pmi_ordering(ray_session, tmp_path):
    """The integer score must rank a strongly-bound pair above a
    frequent-but-independent pair."""
    from ragflow_core16_ray.pipelines.text_analysis import collocations

    # "hong kong" always together; "the cat"/"the dog" split 'the'
    texts = (["hong kong"] * 6
             + ["the cat runs fast"] * 6 + ["the dog runs far"] * 6)
    sf = _write_corpus(tmp_path, texts)
    got = collocations(sf, k=5, min_pair=5)
    assert got.iloc[0]["bigram"] == "hong kong"
    the_cat = got[got["bigram"] == "the cat"]
    assert the_cat.empty or (
        int(the_cat.iloc[0]["score_q"])
        < int(got.iloc[0]["score_q"]))


def test_dsir_select_prefers_target_distribution(ray_session, tmp_path):
    """Importance selection must prefer docs whose vocabulary matches
    the target stratum's LM over out-of-distribution docs."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.text_analysis import dsir_select

    # target (en) talks about cats; fr talks about chiens; two
    # unlabeled-style docs: one cat-like, one chien-like
    texts = (["cat sat mat cat purr"] * 4
             + ["chien os parc chien aboie"] * 4
             + ["cat purr mat", "chien parc os"])
    df = pd.DataFrame({
        "doc_id": pd.array(range(10), dtype="int64"),
        "text": texts,
        "lang": ["en"] * 4 + ["fr"] * 4 + ["fr", "fr"],
        "source": ["src0"] * 10,
        "n_chars": pd.array([len(t) for t in texts], dtype="int64")})
    import os
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    got = dsir_select(str(tmp_path), target_lang="en",
                      frac_num=1, frac_den=2)  # keep top 5 of 10
    kept = set(got["doc_id"])
    assert {0, 1, 2, 3}.issubset(kept)   # the target docs themselves
    assert 8 in kept and 9 not in kept   # cat-like in, chien-like out


def test_dataset_split_proportions_and_determinism(ray_session):
    """Split sizes near 80/10/10, assignment deterministic across runs,
    and every (lang) stratum receives all three splits."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.text_analysis import dataset_split

    a = (dataset_split(SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dataset_split(SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

    n = len(a)
    frac = a["split"].value_counts() / n
    assert 0.7 < frac["train"] < 0.9
    assert 0.05 < frac["val"] < 0.16
    assert 0.05 < frac["test"] < 0.16

    langs = pq.read_table(SF + "/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
    j = a.merge(langs, on="doc_id")
    for _, g in j.groupby("lang"):
        assert set(g["split"]) == {"train", "val", "test"}


def test_corpus_diff_known_snapshot_change(ray_session, tmp_path):
    """Known A/B snapshots: kept, removed, added and within-side dup
    texts counted once each (distinct-hash semantics)."""
    from ragflow_core16_ray.pipelines.dedup import corpus_diff

    # src0/src2 = snapshot A (even), src1 = snapshot B (odd)
    texts = ["shared text", "a only", "a dup", "a dup",
             "shared text", "b only one", "b only two"]
    sources = ["src0", "src0", "src2", "src2",
               "src1", "src1", "src1"]
    sf = _write_corpus(tmp_path, texts, sources=sources)
    got = corpus_diff(sf).iloc[0]
    assert got["n_kept"] == 1      # "shared text"
    assert got["n_removed"] == 2   # "a only", "a dup" (dups once)
    assert got["n_added"] == 2     # the two b-only texts


# textrank fixture: "hub" is adjacent to everything (high centrality);
# "x x" self-pairs must be dropped; single-token and empty docs contribute
# no nodes; runs of whitespace collapse like the oracle's \s+ split
TEXTRANK_TEXTS = [
    "hub alpha hub beta hub gamma",
    "alpha beta  alpha\tgamma",
    "x x x",          # only self-adjacent pairs -> no edges at all
    "hub delta",
    "lonely",         # single token -> isolated, not a node
    "",
]


def _textrank_replica(texts, n_iter=3):
    """Pure-Python int TextRank replica (dict-of-dict graph)."""
    from collections import defaultdict
    edges = defaultdict(int)
    for t in texts:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges[(a, b)] += 1
                edges[(b, a)] += 1
    wtot = defaultdict(int)
    for (s, _), w in edges.items():
        wtot[s] += w
    rank = {s: 1 << 20 for s in wtot}
    for _ in range(n_iter):
        acc = defaultdict(int)
        for (s, d), w in edges.items():
            acc[d] += (rank[s] * w) // wtot[s]
        rank = {d: 157286 + (17 * c) // 20 for d, c in acc.items()}
    return rank


def test_textrank_hub_centrality_and_replica(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import textrank_keywords

    sf = _write_corpus(tmp_path, TEXTRANK_TEXTS)
    got = textrank_keywords(sf, k=100)
    want = _textrank_replica(TEXTRANK_TEXTS)
    assert dict(zip(got["word"], got["rank_q"])) == want
    # the hub word dominates every leaf
    ranks = dict(zip(got["word"], got["rank_q"]))
    assert ranks["hub"] == max(ranks.values())
    # isolated / self-pair-only tokens are not nodes
    assert "lonely" not in ranks and "x" not in ranks


def test_textrank_matches_oracle_on_fixture(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.text_analysis import textrank_keywords

    sf = _write_corpus(tmp_path, TEXTRANK_TEXTS)
    got = _canon(textrank_keywords(sf).astype({"word": str}))
    want = _canon(_oracle(sf, e.oracle_sql()["textrank_keywords"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_textrank_total_mass_conserved(ray_session, tmp_path):
    # power iteration at damping 17/20 preserves total mass up to the
    # per-edge floor losses: N*157286 + floor-bounds around 0.85*prev
    from ragflow_core16_ray.pipelines.text_analysis import textrank_keywords

    sf = _write_corpus(tmp_path, TEXTRANK_TEXTS)
    got = textrank_keywords(sf, k=100, n_iter=1)
    n = len(got)
    total = int(got["rank_q"].sum())
    exact = n * 157286 + (17 * n * (1 << 20)) // 20
    n_edges = 2 * 7  # symmetric directed edge count of the fixture graph
    assert exact - (n_edges + n) <= total <= exact


# substring-dup fixture, k=8: docs 0 and 1 share a 10-token run placed at
# DIFFERENT offsets (straddling any passage tiling); doc 2 repeats an
# 8-token run WITHIN itself; doc 3 is unique; doc 4 is under k tokens
_SHARED10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
SUBSTR_TEXTS = [
    _SHARED10 + " tail0a tail0b",                     # hits pos 1..10
    "head1a head1b head1c " + _SHARED10,              # hits pos 4..13
    "r1 r2 r3 r4 r5 r6 r7 r8 mid " + "r1 r2 r3 r4 r5 r6 r7 r8",
    "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12",
    "tiny doc below k",
    "",
]


def test_substring_dup_spans_hand_computed(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.dedup import substring_dup_spans

    sf = _write_corpus(tmp_path, SUBSTR_TEXTS)
    got = substring_dup_spans(sf, k=8).set_index("doc_id")
    # docs 0/1: three overlapping shared 8-grams merge into ONE 10-token
    # span each (a 10-word tiling would have split or missed these)
    assert got.loc[0].tolist() == [12, 10, 1]
    assert got.loc[1].tolist() == [13, 10, 1]
    # doc 2: the repeated 8-run duplicates both its occurrences
    assert got.loc[2].tolist() == [17, 16, 2]
    # unique doc, sub-k doc, empty doc: zero coverage
    assert got.loc[3].tolist() == [12, 0, 0]
    assert got.loc[4].tolist() == [4, 0, 0]
    assert got.loc[5].tolist() == [0, 0, 0]


def test_substring_dup_spans_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.dedup import substring_dup_spans

    sf = _write_corpus(tmp_path, SUBSTR_TEXTS)
    got = _canon(substring_dup_spans(sf, k=8))
    want = _canon(_oracle(sf, e.oracle_sql()["substring_dup_spans"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# bigram-LM fixture: docs 0-2 repeat the same fluent phrase (high bigram
# counts -> low NLL); doc 3 is unseen-order word soup over the same vocab;
# doc 4 has a self-pair; docs 5/6 have <2 tokens -> excluded
BIGRAM_TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the mat",
    "the cat sat on the mat",
    "mat the on sat cat the",
    "go go go",
    "single",
    "",
]


def _bigram_nll_replica(texts):
    import math
    from collections import Counter
    c2, vocab = Counter(), set()
    for t in texts:
        ws = t.split()
        vocab.update(ws)
        c2.update(zip(ws, ws[1:]))
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    v = len(vocab)
    out = {}
    for did, t in enumerate(texts):
        ws = t.split()
        if len(ws) < 2:
            continue
        nll = [-math.log((c2[(a, b)] + 1.0) / (c1[a] + v))
               for a, b in zip(ws, ws[1:])]
        out[did] = (len(nll),
                    math.floor(sum(nll) / len(nll) * 1e6 + 0.5))
    return out


def test_bigram_lm_nll_replica_and_fluency_order(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import bigram_lm_nll

    sf = _write_corpus(tmp_path, BIGRAM_TEXTS)
    got = bigram_lm_nll(sf)
    want = _bigram_nll_replica(BIGRAM_TEXTS)
    assert {d: (n, q) for d, n, q in
            zip(got["doc_id"], got["n_bigrams"], got["nll_q"])} == want
    by_doc = dict(zip(got["doc_id"], got["nll_q"]))
    # the repeated fluent phrase scores strictly lower NLL than the
    # same-vocab shuffled soup — the order signal a unigram LM cannot see
    assert by_doc[0] < by_doc[3]
    # sub-bigram docs are excluded
    assert 5 not in by_doc and 6 not in by_doc


def test_bigram_lm_nll_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.text_analysis import bigram_lm_nll

    sf = _write_corpus(tmp_path, BIGRAM_TEXTS)
    got = _canon(bigram_lm_nll(sf))
    want = _canon(_oracle(sf, e.oracle_sql()["bigram_lm_nll"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_leakage_matrix_fixture(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.dedup import source_leakage_matrix

    ten = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    other = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    texts = [
        ten + " tailA",            # srcA: tile = ten
        ten + " tailB",            # srcB: shares `ten` with A and C
        ten + " " + other,         # srcC: two tiles, shares both
        other + " more words here",  # srcB: shares `other` with C
        "unique text never repeated anywhere at all ok fine yes",  # srcA
    ]
    sources = ["A", "B", "C", "B", "A"]
    sf = _write_corpus(tmp_path, texts, sources=sources)
    got = source_leakage_matrix(sf, passage_words=10)
    want = pd.DataFrame({
        "src_a": ["A", "A", "B", ],
        "src_b": ["B", "C", "C"],
        "n_shared": pd.array([1, 1, 2], dtype="int64"),
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_leakage_matches_oracle_on_fixture(ray_session, tmp_path):
    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.dedup import source_leakage_matrix

    texts = [
        # three positional tiles, all hashing to the same 10 words —
        # DISTINCT-h semantics must count the X∩Y share once, not thrice
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 3,
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
        "short doc",
        "",
    ]
    sf = _write_corpus(tmp_path, texts, sources=["X", "Y", "X", "Y"])
    got = _canon(source_leakage_matrix(sf))
    want = _canon(_oracle(sf, e.oracle_sql()["source_leakage_matrix"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# NB quality-classifier fixture: src0 is the "reference" class with a
# distinctive vocabulary; docs 4/5 are background; doc 6 mixes; doc 7 is
# empty (excluded). Words overlap enough that both class counters are
# exercised on shared tokens.
NB_TEXTS = [
    "clean prose reads well and cites sources",
    "clean prose cites careful sources",
    "well cited careful clean prose",
    "spam click now buy cheap pills",
    "buy cheap spam pills click here now",
    "cheap spam spam buy click",
    "clean prose buy cheap",
    "",
]
NB_SOURCES = ["src0", "src0", "src0", "srcX", "srcX", "srcY", "srcY", "srcX"]


def _nb_replica(texts, sources, pos="src0"):
    import math
    from collections import Counter
    cp, cn = Counter(), Counter()
    d_pos = d_neg = 0
    for t, s in zip(texts, sources):
        ws = t.split()
        if not ws:
            continue
        if s == pos:
            d_pos += 1
            cp.update(ws)
        else:
            d_neg += 1
            cn.update(ws)
    v = len(set(cp) | set(cn))
    n_pos, n_neg = sum(cp.values()), sum(cn.values())
    prior = math.log(d_pos / d_neg)
    out = {}
    for did, t in enumerate(texts):
        ws = t.split()
        if not ws:
            continue
        sc = sum(math.log(((cp[w] + 1.0) * (n_neg + v))
                          / ((cn[w] + 1.0) * (n_pos + v))) for w in ws)
        out[did] = (len(ws), math.floor((sc + prior) * 1e6 + 0.5))
    return out


def test_nb_quality_scores_replica_and_separation(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import nb_quality_scores

    sf = _write_corpus(tmp_path, NB_TEXTS, sources=NB_SOURCES)
    got = nb_quality_scores(sf)
    want = _nb_replica(NB_TEXTS, NB_SOURCES)
    assert {d: (n, q) for d, n, q in
            zip(got["doc_id"], got["n_tokens"], got["logodds_q"])} == want
    by_doc = dict(zip(got["doc_id"], got["logodds_q"]))
    # reference-class vocabulary scores strictly above background spam
    assert min(by_doc[0], by_doc[1], by_doc[2]) > max(by_doc[3],
                                                      by_doc[4], by_doc[5])
    # the mixed doc sits between the two blocks
    assert by_doc[3] < by_doc[6] < by_doc[0]
    # the empty doc is excluded
    assert 7 not in by_doc


def test_nb_quality_scores_empty_class_raises(ray_session, tmp_path):
    import pytest as _pytest

    from ragflow_core16_ray.pipelines.text_analysis import nb_quality_scores

    sf = _write_corpus(tmp_path, ["a b", "c d"], sources=["srcX", "srcY"])
    with _pytest.raises(ValueError):
        nb_quality_scores(sf)


def test_nb_quality_scores_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e

    from ragflow_core16_ray.pipelines.text_analysis import nb_quality_scores

    sf = _write_corpus(tmp_path, NB_TEXTS, sources=NB_SOURCES)
    got = _canon(nb_quality_scores(sf))
    want = _canon(_oracle(sf, e.oracle_sql()["nb_quality_scores"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_jaccard_threshold_sweep_fixture(ray_session, tmp_path):
    """Hand corpus with one exact dup (J=1.0) and one half-overlap pair:
    the cumulative curve steps exactly where it should."""
    from ragflow_core16_ray.pipelines.dedup import jaccard_threshold_sweep

    texts = [
        "a b c d e f g h",
        "a b c d e f g h",             # J=1.0 with doc 0
        "a b c d e f x y z w",         # partial overlap with 0/1
        "totally different words entirely here now",
    ]
    sf = _write_corpus(tmp_path, texts)
    got = jaccard_threshold_sweep(sf)
    assert got["threshold_pct"].tolist() == list(range(10, 100, 10))
    # the curve is non-increasing and ends at the exact-dup pair count
    n = got["n_pairs"].tolist()
    assert all(a >= b for a, b in zip(n, n[1:]))
    assert n[-1] == 1          # only the exact dup survives J >= 0.9
    assert n[0] >= 3           # the partial pairs appear at J >= 0.1


def test_bpe_fertility_replica(ray_session, tmp_path):
    from ragflow_core16_ray.functions.bpe_counter import bpe_num_tokens
    from ragflow_core16_ray.pipelines.text_analysis import bpe_fertility

    texts = ["the quick brown fox", "le renard brun rapide saute",
             "sehr schnelle braune füchse", ""]
    langs = ["en", "fr", "de", "en"]
    import pandas as pd_
    import pyarrow as pa_
    import pyarrow.parquet as pq_
    df = pd_.DataFrame({
        "doc_id": pd_.array(range(4), dtype="int64"),
        "text": texts, "lang": langs, "source": ["s"] * 4,
        "n_chars": pd_.array([len(t) for t in texts], dtype="int64")})
    import os as os_
    os_.makedirs(str(tmp_path), exist_ok=True)
    pq_.write_table(pa_.Table.from_pandas(df, preserve_index=False),
                    str(tmp_path / "documents.parquet"))
    got = bpe_fertility(str(tmp_path)).set_index("lang")
    import math
    for lang in ("en", "fr", "de"):
        ws = sum(len(t.split()) for t, lg in zip(texts, langs)
                 if lg == lang)
        tk = sum(bpe_num_tokens(t) for t, lg in zip(texts, langs)
                 if lg == lang)
        by = sum(len(t.encode()) for t, lg in zip(texts, langs)
                 if lg == lang)
        assert got.loc[lang, "n_words"] == ws
        assert got.loc[lang, "n_bpe_tokens"] == tk
        assert got.loc[lang, "fertility_q"] == math.floor(
            tk / max(ws, 1) * 1e6 + 0.5)
        assert got.loc[lang, "bytes_per_token_q"] == math.floor(
            by / max(tk, 1) * 1e6 + 0.5)
    # BPE never emits fewer than one token per word
    assert (got["fertility_q"] >= 1_000_000).all()


def test_hll_accuracy_exact_side_and_bound(ray_session, tmp_path):
    import duckdb

    from ragflow_core16_ray.pipelines.text_analysis import hll_accuracy

    texts = [" ".join(f"w{i % 311}" for i in range(j, j + 60))
             for j in range(0, 900, 60)]
    sf = _write_corpus(tmp_path, texts)
    got = hll_accuracy(sf)
    con = duckdb.connect()
    want = con.execute(
        f"SELECT COUNT(DISTINCT w) FROM (SELECT unnest(string_split_regex("
        f"trim(text), '\\s+')) AS w FROM read_parquet("
        f"'{sf}/documents.parquet') WHERE trim(text) <> '')").fetchone()[0]
    assert int(got["n_distinct_exact"][0]) == want
    # 5σ bound at p=12: 5 · 1.04/√4096 ≈ 8.1%
    assert abs(int(got["rel_err_q"][0])) <= 82_000
    # rel_err_q is exactly the quantized (est-exact)/exact
    est, ex = int(got["n_distinct_est"][0]), int(got["n_distinct_exact"][0])
    import math
    assert int(got["rel_err_q"][0]) == math.floor(
        (est - ex) / ex * 1e6 + 0.5)


def test_source_lang_entropy_hand(ray_session, tmp_path):
    import math

    import pandas as pd_
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from ragflow_core16_ray.pipelines.text_analysis import source_lang_entropy

    texts = ["a"] * 6
    langs = ["en", "en", "en", "en", "fr", "de"]
    srcs = ["mono", "mono", "mono", "mix", "mix", "mix"]
    df = pd_.DataFrame({
        "doc_id": pd_.array(range(6), dtype="int64"), "text": texts,
        "lang": langs, "source": srcs,
        "n_chars": pd_.array([1] * 6, dtype="int64")})
    import os as os_
    os_.makedirs(str(tmp_path), exist_ok=True)
    pq_.write_table(pa_.Table.from_pandas(df, preserve_index=False),
                    str(tmp_path / "documents.parquet"))
    got = source_lang_entropy(str(tmp_path)).set_index("source")
    assert got.loc["mono"].tolist() == [3, 1, 0]        # H = 0
    # mix: uniform over 3 langs -> ln 3
    assert got.loc["mix", "n_langs"] == 3
    assert got.loc["mix", "entropy_q"] == math.floor(
        math.log(3) * 1e6 + 0.5)


def test_dup_share_by_source_cross_source(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import dup_share_by_source

    # the dup text spans two sources: BOTH count their copies as dup
    texts = ["same text", "same text", "unique one", "unique two",
             "same text", "other unique"]
    srcs = ["A", "A", "A", "A", "B", "B"]
    sf = _write_corpus(tmp_path, texts, sources=srcs)
    got = dup_share_by_source(sf).set_index("source")
    assert got.loc["A"].tolist() == [4, 2, 500000]
    assert got.loc["B"].tolist() == [2, 1, 500000]


def test_event_user_gini_extremes(ray_session, tmp_path):
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.relational import event_user_gini

    def write(rows, d):
        df = pd.DataFrame({
            "event_id": pd.array(range(len(rows)), dtype="int64"),
            "ts": [pd.Timestamp("2024-01-01")] * len(rows),
            "user_id": pd.array(rows, dtype="int64"),
            "event_type": ["view"] * len(rows),
            "value": [0.0] * len(rows), "props": ["{}"] * len(rows)})
        df["ts"] = df["ts"].astype("datetime64[us]")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, "events.parquet"))
        return d

    # perfectly equal: gini 0
    got = event_user_gini(write([1, 2, 3, 4] * 5, str(tmp_path / "eq")))
    assert got.iloc[0].tolist() == [4, 20, 0]
    # maximal concentration over 4 users: 1 event each for 3, 97 for one
    # → gini = Σ(2i−n−1)x / (n·Σx)
    rows = [1, 2, 3] + [4] * 97
    got = event_user_gini(write(rows, str(tmp_path / "sk")))
    x = sorted([1, 1, 1, 97])
    num = sum((2 * (i + 1) - 4 - 1) * v for i, v in enumerate(x))
    import math
    assert got.iloc[0].tolist() == [4, 100, math.floor(
        num / (4 * 100) * 1e6 + 0.5)]


def test_compression_ratio_replica_and_ordering(ray_session, tmp_path):
    import zlib

    from ragflow_core16_ray.pipelines.text_analysis import compression_ratio

    rep = "spam " * 200                      # highly repetitive
    prose = ("the quick brown fox jumps over the lazy dog and keeps "
             "running through fields of green grass near the river "
             "bank while birds circle overhead in the warm light ") * 5
    import random
    rng = random.Random(7)
    salad = " ".join("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                             for _ in range(8)) for _ in range(150))
    sf = _write_corpus(tmp_path, [rep, prose, salad, ""])
    got = compression_ratio(sf).set_index("doc_id")
    for did, text in enumerate([rep, prose, salad, ""]):
        b = text.encode()
        assert got.loc[did, "raw_bytes"] == len(b)
        assert got.loc[did, "compressed_bytes"] == len(zlib.compress(b, 6))
        assert got.loc[did, "ratio_q"] == (
            len(zlib.compress(b, 6)) * 1_000_000 // max(len(b), 1))
    # repetition compresses hardest, salad worst
    assert (got.loc[0, "ratio_q"] < got.loc[1, "ratio_q"]
            < got.loc[2, "ratio_q"])


def test_metric_correlation_replica(ray_session, tmp_path):
    import math

    from ragflow_core16_ray.pipelines.text_analysis import metric_correlation

    texts = ["a" * 5, "b b b", "c c c c c c", "dd dd", "e " * 30]
    sf = _write_corpus(tmp_path, texts)
    got = metric_correlation(sf)
    xs = [len(t) for t in texts]
    ys = [len(t.split()) for t in texts]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    r = (n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    assert got.iloc[0].tolist() == [n, math.floor(r * 1e6 + 0.5)]


def test_vocab_growth_curve_hand(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import vocab_growth_curve

    # docs 0-3: doc0 brings 2 words, doc1 brings 1 new, doc2 repeats,
    # doc3 brings 2 new
    texts = ["alpha beta", "beta gamma", "alpha gamma", "delta epsilon"]
    sf = _write_corpus(tmp_path, texts)
    got = vocab_growth_curve(sf, step=2)
    assert got["n_docs_prefix"].tolist() == [2, 4]
    assert got["n_distinct_words"].tolist() == [3, 5]
    # monotone non-decreasing by construction
    v = got["n_distinct_words"].tolist()
    assert all(a <= b for a, b in zip(v, v[1:]))


def test_contrastive_pairs_semantics(ray_session, tmp_path):
    import hashlib

    from ragflow_core16_ray.pipelines.dedup import contrastive_pairs

    texts = [
        "a b c d e f g h",        # 0: dup cluster {0,1}
        "a b c d e f g h",        # 1
        "p q r s t u v w",        # 2: dup cluster {2,3}
        "p q r s t u v w",        # 3
        "completely unrelated words one",   # 4
        "another set of free words two",    # 5
    ]
    sf = _write_corpus(tmp_path, texts)
    got = contrastive_pairs(sf)
    by_anchor = {(a, p): n for a, p, n in
                 zip(got["anchor"], got["positive"], got["negative"])}
    assert set(by_anchor) == {(0, 1), (2, 3)}
    # replica of the md5-argmin negative
    for a, banned in ((0, {0, 1}), (2, {2, 3})):
        cands = [(hashlib.md5(f"{a}:{d}".encode()).hexdigest(), d)
                 for d in range(6) if d not in banned]
        want = min(cands)[1]
        assert by_anchor[(a, a + 1)] == want
        assert want not in banned


def test_dedup_retention_by_source_hand(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.dedup import dedup_retention_by_source

    texts = [
        "a b c d e f g h",       # 0 src A — cluster rep (kept)
        "a b c d e f g h",       # 1 src B — dropped (rep is 0)
        "x y z w q r s t",       # 2 src A — unique (kept)
        "",                      # 3 src B — empty, kept (no shingles)
    ]
    sf = _write_corpus(tmp_path, texts, sources=["A", "B", "A", "B"])
    got = dedup_retention_by_source(sf).set_index("source")
    assert got.loc["A"].tolist() == [2, 2, 16, 16, 1_000_000]
    assert got.loc["B"].tolist() == [2, 1, 8, 0, 500_000]


def test_zipf_exponent_replica(ray_session, tmp_path):
    import math

    from ragflow_core16_ray.pipelines.text_analysis import zipf_exponent

    # construct an exact Zipf-ish corpus: word_i appears 60//(i+1) times
    words = []
    for i in range(12):
        words += [f"w{i}"] * (60 // (i + 1))
    sf = _write_corpus(tmp_path, [" ".join(words)])
    got = zipf_exponent(sf, top_n=12)
    cnts = sorted(([60 // (i + 1) for i in range(12)]), reverse=True)
    n = 12
    x = [math.log(r) for r in range(1, n + 1)]
    y = [math.log(c) for c in cnts]
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got.iloc[0]["n_terms"] == n
    assert got.iloc[0]["slope_q"] == math.floor(slope * 1e6 + 0.5)
    # a Zipf-ish corpus fits a slope near -1
    assert -1_300_000 < got.iloc[0]["slope_q"] < -700_000


def test_stopword_coverage_flags_mislabeled(ray_session, tmp_path):
    import pandas as pd_
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from ragflow_core16_ray.pipelines.text_analysis import stopword_coverage

    texts = [
        "the cat and the dog is in that house for it with them",  # en ok
        "the cat and the dog is in that house for it with them",  # "fr"!
        "le chat et la maison dans les champs de la ville",        # fr ok
        "编号汉字文本测试",                                          # zh
    ]
    langs = ["en", "fr", "fr", "zh"]
    df = pd_.DataFrame({
        "doc_id": pd_.array(range(4), dtype="int64"), "text": texts,
        "lang": langs, "source": ["s"] * 4,
        "n_chars": pd_.array([len(t) for t in texts], dtype="int64")})
    import os as os_
    os_.makedirs(str(tmp_path), exist_ok=True)
    pq_.write_table(pa_.Table.from_pandas(df, preserve_index=False),
                    str(tmp_path / "documents.parquet"))
    got = stopword_coverage(str(tmp_path)).set_index("doc_id")
    # correctly-labeled docs cover well; the mislabeled one near zero
    assert got.loc[0, "cover_q"] > 400_000
    assert got.loc[1, "cover_q"] == 0       # en text labeled fr
    assert got.loc[2, "cover_q"] > 300_000
    # zh: words are CJK chars, no Latin markers
    assert got.loc[3, "n_words"] == 8 and got.loc[3, "n_stop"] == 0


def test_doc_entropy_separates_repetition(ray_session, tmp_path):
    import math

    from ragflow_core16_ray.pipelines.text_analysis import doc_entropy

    texts = ["spam spam spam spam spam spam",
             "six distinct words appear here once",
             "a a b b c c", ""]
    sf = _write_corpus(tmp_path, texts)
    got = doc_entropy(sf).set_index("doc_id")
    assert got.loc[0, "entropy_q"] == 0           # single repeated type
    assert got.loc[1, "entropy_q"] == math.floor(
        math.log(6) * 1e6 + 0.5)                  # uniform over 6
    assert got.loc[2, "entropy_q"] == math.floor(
        math.log(3) * 1e6 + 0.5)                  # uniform over 3
    assert 3 not in got.index                     # empty excluded
    assert got.loc[0, "entropy_q"] < got.loc[2, "entropy_q"] \
        < got.loc[1, "entropy_q"]


def test_quality_filter_agreement_fixture(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import (
        quality_filter_agreement)

    # 55 words, stopwords present, alphabetic, mean len in bounds
    good = ("the quick brown fox jumps over lazy dogs and keeps running "
            "through green fields near that old river bank while many "
            "birds circle overhead in warm light with gentle winds "
            "that carry seeds across wide open meadows toward distant "
            "hills where quiet farms rest beside clear streams flowing "
            "past small stone bridges today")  # 53 words ≥ gopher's 50
    texts = [
        good,                      # src0: gopher pass AND NB positive
        good + " extra words",     # srcX: gopher pass, NB negative-ish
        "short doc",               # srcX: fails gopher
    ]
    sf = _write_corpus(tmp_path, texts, sources=["src0", "srcX", "srcX"])
    got = quality_filter_agreement(sf)
    assert int(got["n_docs"][0]) == 3
    assert int(got["n_gopher"][0]) == 2
    # doc 0 shares src0's whole vocabulary -> strongly positive; doc 1
    # shares it too but the prior and the neg-class counts pull it down
    assert int(got["n_both"][0]) >= 1
    assert int(got["n_nb"][0]) >= 1
    n_g, n_nb, n_b = (int(got["n_gopher"][0]), int(got["n_nb"][0]),
                      int(got["n_both"][0]))
    assert int(got["jaccard_q"][0]) == n_b * 1_000_000 // max(
        n_g + n_nb - n_b, 1)


def test_bloom_fpr_calibration_replica_and_theory(ray_session, tmp_path):
    import math

    import numpy as np

    from ragflow_core16_ray.pipelines.dedup import (_bloom_positions,
                                                    bloom_fpr_calibration)

    # undersized filter (2 bits/key) so the FPR is comfortably non-zero
    texts = [f"prior document number {i} words words" for i in range(64)]
    sf = _write_corpus(tmp_path, texts,
                       sources=["src0"] * 64)  # src0 = prior (even)
    got = bloom_fpr_calibration(sf, bits_per_key=2, k_hashes=2,
                                n_probes=4000)
    m = int(got["m_bits"][0])
    n_keys = int(got["n_keys"][0])
    assert n_keys == 64
    # replica: rebuild the filter and re-probe
    bloom = np.zeros(m >> 3, dtype=np.uint8)
    pos = _bloom_positions(texts, m, 2).ravel()
    np.bitwise_or.at(bloom, (pos >> np.uint64(3)).astype(np.int64),
                     (np.uint8(1) << (pos & np.uint64(7))
                      .astype(np.uint8)))
    probes = [f"__bloom_probe__:{i}" for i in range(4000)]
    ppos = _bloom_positions(probes, m, 2)
    bi = (ppos >> np.uint64(3)).astype(np.int64)
    bit = (np.uint8(1) << (ppos & np.uint64(7)).astype(np.uint8))
    n_fp = int(((bloom[bi] & bit) != 0).all(axis=1).sum())
    assert int(got["n_false_pos"][0]) == n_fp
    # measured FPR within a loose multiplicative band of theory
    theory = (1.0 - math.exp(-2 * n_keys / m)) ** 2
    assert int(got["theory_fpr_q"][0]) == math.floor(theory * 1e6 + 0.5)
    measured = n_fp / 4000
    assert 0.2 * theory <= measured <= 5 * theory + 1e-3


def test_badwords_filter_token_not_substring(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import badwords_filter

    sf = _write_corpus(tmp_path, [
        "fast clean text here",          # kept
        "this is slow and stale",        # 2 bad tokens
        "slower is not slow-ish either",  # substrings only -> kept
        "slow slow slow",                # 3 bad tokens
        "",                              # empty -> kept
    ])
    got = (badwords_filter(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["n_bad"]) == [0, 2, 0, 3, 0]
    assert list(got["kept"]) == [1, 0, 1, 0, 1]


def test_domain_quota_sample_cap_and_determinism(ray_session, tmp_path):
    import hashlib

    from ragflow_core16_ray.pipelines.text_analysis import \
        domain_quota_sample

    # 30 docs in srcA, 2 in srcB; quota 5 keeps 5 + 2
    texts = [f"doc number {i}" for i in range(32)]
    sources = ["srcA"] * 30 + ["srcB"] * 2
    sf = _write_corpus(tmp_path, texts, sources=sources)
    got = domain_quota_sample(sf, quota=5)
    assert got.groupby("source").size().to_dict() == {"srcA": 5, "srcB": 2}
    # exactly the 5 smallest md5(doc_id) digests in srcA — the same
    # deterministic draw the SQL oracle makes
    want = sorted(range(30),
                  key=lambda d: hashlib.md5(str(d).encode()).hexdigest())[:5]
    assert sorted(got[got["source"] == "srcA"]["doc_id"]) == sorted(want)
    got2 = domain_quota_sample(sf, quota=5)
    pd.testing.assert_frame_equal(got, got2)


def test_source_jaccard_matrix_hand(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import \
        source_jaccard_matrix

    # A vocab {a,b,c}, B vocab {b,c,d}, C vocab {x}
    sf = _write_corpus(tmp_path,
                       ["a b c", "b c", "b c d", "d d d", "x"],
                       sources=["A", "A", "B", "B", "C"])
    got = source_jaccard_matrix(sf)
    m = {(r.source_a, r.source_b): (r.inter, r.uni, r.jaccard_q)
         for r in got.itertuples()}
    assert m[("A", "B")] == (2, 4, (2_000_000 * 2 + 4) // 8)  # {b,c}/{a,b,c,d}
    assert m[("A", "C")] == (0, 4, 0)
    assert m[("B", "C")] == (0, 4, 0)


def test_encoding_quality_planted_damage(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import encoding_quality

    sf = _write_corpus(tmp_path, [
        "perfectly clean text",
        "bad � char � twice",
        "moji Ã© and â€œquotedâ€\x9d text Â here",
        "ctl \x01\x02 but \t\n\r are fine",
    ])
    got = (encoding_quality(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["n_fffd"]) == [0, 2, 0, 0]
    # \x9d is C1 — the counter scopes to C0 (binary bleed-through);
    # C1 bytes are already covered by the mojibake markers
    assert list(got["n_control"]) == [0, 0, 0, 2]
    assert list(got["n_mojibake"]) == [0, 0, 4, 0]


def test_run_clean_screen_stage_drops_and_counts(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.clean import run_clean

    base = ("the quick brown fox jumps over that lazy dog and then "
            "some more plain words follow here to keep gopher rules "
            "happy with this document length and structure overall "
            "because fifty words are required at minimum for the "
            "gopher length gate to pass cleanly in the final stage "
            "of this pipeline run today")
    texts = [
        base + " alpha",
        base + " slow beta",           # blocklist token -> dropped
        base + " moji Ã© damage",      # mojibake marker -> dropped
        base + " bad \x01 control",    # C0 control -> dropped
        base + " slower gamma",        # substring only -> kept
    ]
    sf = _write_corpus(tmp_path / "in", texts)
    m = run_clean(sf, str(tmp_path / "out"))
    assert m["n_badwords_dropped"] == 1
    assert m["n_encoding_dropped"] == 2
    final = pq.read_table(m["output"]).to_pandas()
    kept = set(final["doc_id"])
    assert 1 not in kept and 2 not in kept and 3 not in kept
    assert {0, 4} <= kept or len(kept) >= 1  # survivors pass gopher too


def test_length_ks_by_source_hand(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.text_analysis import \
        length_ks_by_source

    # A: lengths {1,2}; B: lengths {8,9,10}; global n=5
    sf = _write_corpus(tmp_path, ["a", "bb", "12345678", "123456789",
                                  "1234567890"],
                       sources=["A", "A", "B", "B", "B"])
    got = length_ks_by_source(sf)
    by = {r.source: (r.ns, r.ng, r.ks_num) for r in got.itertuples()}
    # at len=2: cs_A=2, cg=2, ns=2, ng=5 -> |2*5 - 2*2| = 6 (max for A)
    assert by["A"] == (2, 5, 6)
    # B mirrors: at len=2 cs_B=0, cg=2 -> |0*5 - 2*3| = 6
    assert by["B"] == (3, 5, 6)
