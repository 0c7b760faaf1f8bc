"""Property-style checks (SURVEY.md §5): randomized inputs via
hypothesis, invariants asserted over the Spark results. Example counts
are kept small because each example runs a Spark job."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators import dedup as D
from solana_data_etl_pipeline_spark.operators.parse import parse_blocks
from solana_data_etl_pipeline_spark.operators.temporal import asof_join, sessionize
from solana_data_etl_pipeline_spark.sources.blocks import blocks_to_df
from solana_data_etl_pipeline_spark.sources.fixtures import make_block

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

T0 = dt.datetime(2024, 1, 1)


@given(slots=st.sets(st.integers(min_value=1, max_value=200), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_event_ids_unique_and_replay_stable(spark, slots):
    blocks = [make_block(s) for s in sorted(slots)]
    df = parse_blocks(blocks_to_df(spark, blocks))
    ids = [r.event_id for r in df.select("event_id").collect()]
    assert len(ids) == len(set(ids))
    again = [r.event_id for r in parse_blocks(blocks_to_df(spark, blocks)).select("event_id").collect()]
    assert sorted(ids) == sorted(again)


def _py_shingles(words: list[str], n: int = D.SHINGLE_N) -> set[str]:
    """Python twin of dedup.shingles_from_tokens: distinct word n-grams;
    a doc shorter than n yields one partial gram."""
    if len(words) < n:
        return {" ".join(words)}
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


@given(
    base=st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=20),
    mutations=st.integers(min_value=0, max_value=3),
)
@settings(**SETTINGS)
def test_minhash_estimate_tracks_true_jaccard(spark, base, mutations):
    """Signature agreement is an unbiased-ish estimator of true shingle
    Jaccard with std <= 1/(2*sqrt(H)). Identical docs must agree
    everywhere; otherwise agreement must sit within a generous
    Hoeffding band of the true Jaccard (P[escape] < 1e-3 per example),
    NOT the old `agree < 1.0` claim -- all H minima can legitimately
    survive one mutated shingle with probability ~J^H."""
    words_a = [f"w{c}{i}" for i, c in enumerate(base)]
    words_b = list(words_a)
    for m in range(mutations):
        words_b[m % len(words_b)] = f"mut{m}"
    df = spark.createDataFrame(
        [(0, " ".join(words_a)), (1, " ".join(words_b))], "doc_id long, text string"
    )
    sigs = {r.doc_id: list(r.minhash) for r in D.minhash_signatures(df).collect()}
    agree = sum(x == y for x, y in zip(sigs[0], sigs[1])) / D.MINHASH_HASHES
    sa, sb = _py_shingles(words_a), _py_shingles(words_b)
    jac = len(sa & sb) / len(sa | sb)
    if mutations == 0:
        assert jac == 1.0
        assert agree == 1.0
    else:
        assert jac < 1.0
        assert jac - 0.6 <= agree <= min(jac + 0.6, 1.0)


def test_minhash_disjoint_docs_rarely_agree(spark):
    """Fully-disjoint shingle sets (J=0): expected agreement 0, so
    anything above the Hoeffding band means the hash family is broken
    (e.g. constant signatures)."""
    words_a = [f"left{i}" for i in range(12)]
    words_b = [f"right{i}" for i in range(12)]
    df = spark.createDataFrame(
        [(0, " ".join(words_a)), (1, " ".join(words_b))], "doc_id long, text string"
    )
    sigs = {r.doc_id: list(r.minhash) for r in D.minhash_signatures(df).collect()}
    agree = sum(x == y for x, y in zip(sigs[0], sigs[1])) / D.MINHASH_HASHES
    assert agree <= 0.6


@given(
    ts_offsets=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=12),
    gap_minutes=st.sampled_from([5, 30, 120]),
)
@settings(**SETTINGS)
def test_sessionize_invariants(spark, ts_offsets, gap_minutes):
    rows = [
        (i, 1, T0 + dt.timedelta(seconds=off)) for i, off in enumerate(sorted(set(ts_offsets)))
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sorted(
        sessionize(df, gap_minutes=gap_minutes).collect(), key=lambda r: (r.ts, r.event_id)
    )
    # session ids start at 1, are monotone, and bump exactly on gaps
    assert out[0].session_seq == 1
    for prev, cur in zip(out, out[1:]):
        gap = (cur.ts - prev.ts).total_seconds()
        expected_bump = 1 if gap > gap_minutes * 60 else 0
        assert cur.session_seq == prev.session_seq + expected_bump


@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=8),
    right_ts=st.lists(st.integers(min_value=0, max_value=5000), min_size=0, max_size=8),
)
@settings(**SETTINGS)
def test_asof_invariants(spark, left_ts, right_ts):
    left = spark.createDataFrame(
        [(i, 1, T0 + dt.timedelta(seconds=s)) for i, s in enumerate(sorted(set(left_ts)))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100 + i, 1, T0 + dt.timedelta(seconds=s), float(s)) for i, s in enumerate(sorted(set(right_ts)))],
        "event_id long, user_id long, ts timestamp, v double",
    )
    out = asof_join(left, right, on="user_id", ts="ts", right_cols=["v"]).collect()
    rset = sorted(set(right_ts))
    assert len(out) == len(set(left_ts))  # left rows preserved
    for r in out:
        lsec = (r.ts - T0).total_seconds()
        expected = max((s for s in rset if s <= lsec), default=None)
        if expected is None:
            assert r.asof_ts is None and r.asof_v is None
        else:
            assert (r.asof_ts - T0).total_seconds() == expected
            assert r.asof_v == float(expected)


@given(texts=st.lists(st.text(alphabet="abc d", min_size=0, max_size=30), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_exact_dedup_partitions_corpus(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    groups = D.exact_duplicates(df).collect()
    assert sum(r.dup_count for r in groups) == len(texts)
    norm = {" ".join(t.lower().split()) for t in texts}
    assert len(groups) == len(norm)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # user
            st.sampled_from(["signup", "view", "click", "purchase"]),
            st.integers(min_value=0, max_value=50),  # minute offset
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_event_funnel_matches_reference_model(spark, events):
    """Spark funnel == brute-force Python funnel on arbitrary event
    interleavings (ties, missing stages, out-of-order users)."""
    from solana_data_etl_pipeline_spark.plans.behavioral import FUNNEL_STAGES, event_funnel

    rows = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 0.0, "{}")
        for i, (u, t, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = {r.stage: r.users for r in event_funnel(df).collect()}

    firsts = {}
    for _i, (u, t, m) in enumerate(events):
        cur = firsts.setdefault(u, {})
        if t not in cur or m < cur[t]:
            cur[t] = m
    expected = {s: 0 for s in FUNNEL_STAGES}
    for stages in firsts.values():
        prev = None
        for s in FUNNEL_STAGES:
            if s not in stages or (prev is not None and stages[s] < prev):
                break
            expected[s] += 1
            prev = stages[s]
    assert got == expected


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_repetition_stats_matches_python_model(spark, docs):
    """repetition_stats vs a direct Python mode computation: the
    sort + longest-equal-run trick must equal collections.Counter."""
    from collections import Counter

    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in X_rep(df).collect()}
    for i, words in enumerate(docs):
        wc = Counter(words)
        n = len(words)
        bigrams = Counter(" ".join(words[j : j + 2]) for j in range(n - 1))
        r = got[i]
        assert r.n_words == n
        assert r.dup_word_frac == round((n - len(wc)) / n, 4)
        assert r.top_word_frac == round(max(wc.values()) / n, 4)
        expect_bg = round(max(bigrams.values()) / max(n - 1, 1), 4) if bigrams else 0.0
        assert r.top_bigram_frac == expect_bg


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=8),
    budget=st.integers(min_value=2, max_value=40),
)
@settings(**SETTINGS)
def test_pack_sequences_offset_invariants(spark, sizes, budget):
    """Packing invariants for any doc-length profile and budget:
    offsets are the exclusive prefix sum in id order, every doc's
    sequence span covers exactly its token range, and spans are
    consistent with the budget."""
    rows = [(i, " ".join(f"t{j}" for j in range(k)), "s") for i, k in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(X_pack(df, budget=budget).collect(), key=lambda r: r.doc_id)
    running = 0
    for r, k in zip(got, sizes):
        assert r.n_tokens == k
        assert r.start_offset == running
        assert r.first_seq == running // budget
        assert r.last_seq == (running + k - 1) // budget
        assert r.first_seq <= r.last_seq <= r.first_seq + (k // budget) + 1
        running += k


def X_rep(df):
    from solana_data_etl_pipeline_spark.operators.text import repetition_stats

    return repetition_stats(df)


def X_pack(df, budget):
    from solana_data_etl_pipeline_spark.operators.text import pack_sequences

    return pack_sequences(df, budget=budget)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=3, max_size=10),
        min_size=2,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_span_dup_stats_matches_interval_union_model(spark, docs):
    """span_dup_stats vs a direct Python model: tokens covered by any
    corpus-duplicated 3-gram, computed by brute-force position marking."""
    from collections import Counter

    n = 3
    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from solana_data_etl_pipeline_spark.operators.text import span_dup_stats

    got = {r.doc_id: r for r in span_dup_stats(df, n=n).collect()}

    grams = Counter()
    for w in docs:
        for j in range(len(w) - n + 1):
            grams[" ".join(w[j : j + n])] += 1
    for i, w in enumerate(docs):
        covered = set()
        for j in range(len(w) - n + 1):
            if grams[" ".join(w[j : j + n])] >= 2:
                covered.update(range(j, j + n))
        r = got[i]
        assert r.n_tokens == len(w)
        assert r.dup_span_tokens == len(covered), (i, w)
        assert r.dup_span_frac == round(len(covered) / max(len(w), 1), 4)


@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=8),
    window=st.integers(min_value=2, max_value=12),
    stride_frac=st.integers(min_value=1, max_value=12),
)
@settings(**SETTINGS)
def test_chunk_documents_invariants(spark, n_tokens, window, stride_frac):
    """For any (window, stride<=window): every token of every doc lies
    in >=1 chunk, chunk_ids are dense from 0, starts form the stride
    series, and rejoining chunk 0..k reconstructs a prefix of the doc."""
    from solana_data_etl_pipeline_spark.operators.text import chunk_documents

    stride = max(1, min(window, stride_frac))
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(n_tokens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, window=window, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(n_tokens):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        # dense 0-based chunk ids, stride-spaced starts
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert all(c.start_token == c.chunk_id * stride for c in chunks)
        # full coverage: union of [start, start+len) == [0, n)
        covered = set()
        for c in chunks:
            assert c.n_chunk_tokens == len(c.chunk_text.split(" "))
            assert c.n_chunk_tokens <= window
            covered |= set(range(c.start_token, c.start_token + c.n_chunk_tokens))
        assert covered == set(range(n)), (i, n, window, stride)
        # chunk text is the doc's token slice
        toks = rows[i][1].split(" ")
        for c in chunks:
            assert c.chunk_text.split(" ") == toks[c.start_token : c.start_token + c.n_chunk_tokens]


@given(
    vals=st.lists(st.integers(min_value=0, max_value=1000), min_size=5, max_size=40),
    lo_pct=st.integers(min_value=0, max_value=30),
    hi_pct=st.integers(min_value=70, max_value=100),
)
@settings(**SETTINGS)
def test_quantile_gate_invariants(spark, vals, lo_pct, hi_pct):
    """For any value multiset and (lo_q, hi_q): the gate keeps exactly
    the rows whose value lies between the histogram-derived thresholds,
    thresholds are actual data values, and the kept fraction is at
    least (hi_q - lo_q) of the corpus (quantile semantics: each
    threshold bucket is inclusive)."""
    from solana_data_etl_pipeline_spark.operators.text import quantile_gate

    lo_q, hi_q = lo_pct / 100.0, hi_pct / 100.0
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "doc_id long, v double"
    )
    kept = [r.v for r in quantile_gate(df, "v", lo_q=lo_q, hi_q=hi_q).collect()]
    s = sorted(vals)
    n = len(s)
    # python model: smallest value whose cumulative fraction >= q,
    # computed over the same (value -> count) histogram
    import itertools

    def thresh(q):
        cum = 0
        for val, grp in itertools.groupby(s):
            cum += len(list(grp))
            if cum / n >= q:
                return float(val)
        return float(s[-1])

    lo_t, hi_t = thresh(lo_q), thresh(hi_q)
    expected = sorted(float(v) for v in vals if lo_t <= v <= hi_t)
    assert sorted(kept) == expected, (lo_t, hi_t, lo_q, hi_q)
    # thresholds are data values and the band is non-empty
    assert lo_t in [float(v) for v in vals] and hi_t in [float(v) for v in vals]
    assert len(expected) >= 1


@given(
    corpus_texts=st.lists(
        st.lists(st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
                 min_size=4, max_size=10).map(" ".join),
        min_size=1, max_size=4,
    ),
    delta_texts=st.lists(
        st.lists(st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
                 min_size=4, max_size=10).map(" ".join),
        min_size=1, max_size=4,
    ),
)
@settings(**SETTINGS)
def test_delta_dedup_matches_python_model(spark, tmp_path_factory, corpus_texts, delta_texts):
    """delta_dedup_materialized against a full independent Python model
    of the pipeline: shingles -> minhash signatures -> band collisions
    -> exact-Jaccard verify -> (corpus-hit OR smaller-id-delta-hit)
    drop rules. Random tiny-vocab corpora make band collisions and
    near-dups plentiful."""
    import hashlib

    from solana_data_etl_pipeline_spark.operators import dedup as D
    from solana_data_etl_pipeline_spark.operators.dedup import (
        delta_dedup_materialized,
        materialize_minhash,
    )

    corpus = [(i, t) for i, t in enumerate(corpus_texts)]
    delta = [(100 + i, t) for i, t in enumerate(delta_texts)]

    def _norm(t):
        return " ".join(t.lower().split())

    def _shingles(t, n=3):
        toks = _norm(t).split(" ")
        grams = [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)]
        out = []
        for g in grams:
            if g not in out:
                out.append(g)
        return out

    def _sig(text):
        a, b = D.minhash_coeffs()
        bases = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % D._BASE_MOD
            for g in _shingles(text)
        ]
        return [min((a[s] * x + b[s]) % D.MINHASH_MOD for x in bases) for s in range(D.MINHASH_HASHES)]

    def _bands(sig):
        rows = D.MINHASH_ROWS
        return {
            (bi, hashlib.md5(",".join(str(v) for v in sig[bi * rows : (bi + 1) * rows]).encode()).hexdigest())
            for bi in range(D.MINHASH_BANDS)
        }

    def _jac(ta, tb):
        sa, sb = set(_shingles(ta)), set(_shingles(tb))
        return len(sa & sb) / len(sa | sb)

    all_docs = dict(corpus + delta)
    bands = {i: _bands(_sig(t)) for i, t in all_docs.items()}
    threshold = 0.2
    dropped = set()
    for d_id, d_text in delta:
        for c_id, c_text in corpus:
            if bands[d_id] & bands[c_id] and _jac(d_text, c_text) >= threshold:
                dropped.add(d_id)
        for d2_id, d2_text in delta:
            if d2_id < d_id and bands[d_id] & bands[d2_id] and _jac(d_text, d2_text) >= threshold:
                dropped.add(d_id)
    expected = sorted(i for i, _ in delta if i not in dropped)

    path = str(tmp_path_factory.mktemp("ddidx"))
    corpus_df = spark.createDataFrame(corpus, "doc_id long, text string")
    delta_df = spark.createDataFrame(delta, "doc_id long, text string")
    materialize_minhash(corpus_df, path)
    got = sorted(
        r.doc_id
        for r in delta_dedup_materialized(spark, path, delta_df, threshold=threshold).collect()
    )
    assert got == expected, (corpus_texts, delta_texts, sorted(dropped))


@given(
    epochs=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),
                st.integers(min_value=0, max_value=12),
            ).filter(lambda p: p[0] != p[1]),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_incremental_clusters_match_batch_cc(spark, tmp_path_factory, epochs):
    """catch_up_clusters over arbitrary per-epoch pair batches must end
    exactly where batch connected_components over the union of all
    pairs ends -- the incremental contracted-graph/remap machinery is
    pure bookkeeping. Also pins the remap log's fully-resolved
    invariant after every epoch."""
    from solana_data_etl_pipeline_spark.operators.dedup import connected_components
    from solana_data_etl_pipeline_spark.streaming.clusters import (
        append_pairs,
        catch_up_clusters,
        streamed_clusters,
    )

    idx = str(tmp_path_factory.mktemp("clu"))
    seen: list[tuple[int, int]] = []
    for e, batch in enumerate(epochs):
        pairs = spark.createDataFrame(batch or [(0, 0)], "doc_a long, doc_b long")
        if not batch:
            pairs = pairs.filter("doc_a <> doc_a")  # empty epoch
        append_pairs(spark, idx, pairs, epoch=e)
        catch_up_clusters(spark, idx)
        seen.extend((min(a, b), max(a, b)) for a, b in batch)
        try:
            remaps = spark.read.parquet(f"{idx}/remaps").collect()
        except Exception:
            remaps = []
        olds = {r.old_root for r in remaps}
        news = {r.new_root for r in remaps}
        assert not (olds & news), "remap log must stay fully resolved"

    got = {r.doc_id: r.cluster_id for r in streamed_clusters(spark, idx).collect()}
    if not seen:
        assert got == {}
        return
    batch_pairs = spark.createDataFrame(sorted(set(seen)), "doc_a long, doc_b long")
    want = {r.id: r.cluster_id for r in connected_components(batch_pairs).collect()}
    assert got == want


@given(
    ids=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
    n_shards=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=3),
)
@settings(**SETTINGS)
def test_training_shuffle_matches_python_model(spark, ids, n_shards, seed):
    """training_shuffle against an independent Python model of the
    md5 keying, sharding, and per-shard ranking."""
    import hashlib

    from solana_data_etl_pipeline_spark.operators.text import training_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in training_shuffle(df, n_shards=n_shards, seed=seed).collect()
    }

    def key(i):
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)

    want = {}
    by_shard = {}
    for i in ids:
        by_shard.setdefault(key(i) % n_shards, []).append(i)
    for shard, members in by_shard.items():
        for pos, i in enumerate(sorted(members, key=lambda x: (key(x), x)), start=1):
            want[i] = (shard, pos)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(min_value=0, max_value=1, width=16)),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=20,
    ),
    budget=st.integers(min_value=0, max_value=300),
)
@settings(**SETTINGS)
def test_token_budget_select_matches_python_model(spark, rows, budget):
    """token_budget_select against an independent Python model of the
    histogram/cumulative/threshold rule."""
    from solana_data_etl_pipeline_spark.operators.text import token_budget_select

    data = [(i, s, w) for i, (s, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, score double, w long")
    got = {
        r.doc_id
        for r in token_budget_select(
            df, budget=budget, score_col="score", weight_col="w"
        ).collect()
    }

    from decimal import ROUND_HALF_UP, Decimal

    def r4(x):
        # mirror Spark's HALF_UP (Python round() is banker's)
        return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))

    buckets = {}
    for _i, (s, w) in enumerate(rows):
        if s is None:
            continue
        buckets.setdefault(r4(s), 0)
        buckets[r4(s)] += w
    thr = None
    cum = 0
    for v in sorted(buckets, reverse=True):
        cum += buckets[v]
        if cum <= budget:
            thr = v
        else:
            break
    want = (
        set()
        if thr is None
        else {i for i, (s, w) in enumerate(rows) if s is not None and r4(s) >= thr}
    )
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)),
        min_size=0,
        max_size=25,
    ),
    val_ids=st.sets(st.integers(min_value=0, max_value=30), max_size=10),
)
@settings(**SETTINGS)
def test_decontaminate_split_cluster_property(spark, edges, val_ids):
    """Cluster-level decontamination invariants over random pair graphs
    and split assignments: (1) every val doc survives; (2) NO surviving
    train doc shares a connected component with any val doc; (3) train
    docs in val-free components all survive."""
    edges = [(a, b) for a, b in edges if a != b]
    ids = sorted(set(range(8)) | {i for e in edges for i in e})
    labeled = spark.createDataFrame(
        [(i, "val" if i in val_ids else "train") for i in ids],
        "doc_id long, split string",
    )
    pairs = spark.createDataFrame(edges or [(98, 99)], "doc_a long, doc_b long")
    got = {r.doc_id: r.split for r in D.decontaminate_split(labeled, pairs).collect()}

    # python union-find ground truth
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    comp_has_val = {}
    for i in ids:
        comp_has_val.setdefault(find(i), False)
    for i in ids:
        if i in val_ids:
            comp_has_val[find(i)] = True
    for i in ids:
        if i in val_ids:
            assert got.get(i) == "val", i
        elif comp_has_val[find(i)]:
            assert i not in got, i
        else:
            assert got.get(i) == "train", i


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["dup line one", "dup line two", "x y", "p q r", "", "  "]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_line_dedup_matches_python_model(spark, docs):
    """line_dedup == the obvious Python first-wins model: every
    distinct CONTENT line survives exactly once across the corpus (at
    its first (doc_id, pos)), whitespace lines always survive, counts
    reconcile, and clean_text is the in-order join of survivors."""
    from solana_data_etl_pipeline_spark.operators.text import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in line_dedup(df).collect()}

    seen: set[str] = set()
    for i, lines in enumerate(docs):
        kept = []
        for line in lines:
            if line.strip() == "":
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
        r = got[i]
        assert r.n_lines == len(lines)
        assert r.kept_lines == len(kept)
        assert r.removed_lines == len(lines) - len(kept)
        assert r.clean_text == "\n".join(kept)


@given(
    toks=st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12),
    perm_seed=st.integers(min_value=0, max_value=10_000),
)
@settings(**SETTINGS)
def test_hash_embed_permutation_invariant_unit_norm(spark, toks, perm_seed):
    """hash_embed is a bag-of-words map: any permutation of the same
    multiset embeds identically, and every nonempty vector has unit
    L2 norm (empty docs are zero vectors)."""
    import math
    import random

    from solana_data_etl_pipeline_spark.operators.text import hash_embed

    shuffled = list(toks)
    random.Random(perm_seed).shuffle(shuffled)
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(shuffled))], "doc_id long, text string"
    )
    got = {r.vec_id: list(r.embedding) for r in hash_embed(df).collect()}
    assert got[1] == got[2]
    norm2 = sum(x * x for x in got[1])
    if toks:
        assert math.isclose(norm2, 1.0, rel_tol=1e-9)
    else:
        assert norm2 == 0.0


@given(
    caps=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=6),
    weights=st.lists(st.integers(min_value=1, max_value=9), min_size=6, max_size=6),
    budget=st.integers(min_value=0, max_value=5000),
)
@settings(**SETTINGS)
def test_epoch_plan_conservation_laws(spark, caps, weights, budget):
    """For ANY capacity/weight profile and budget: total tokens served
    equals min(budget, max_epochs * total capacity) -- the greedy fill
    neither loses nor invents tokens; per-source service never exceeds
    max_epochs passes; and a Python replay of the same greedy order
    reproduces every allocation exactly."""
    from solana_data_etl_pipeline_spark.operators.text import epoch_plan

    rows = [(f"s{i}", c, weights[i]) for i, c in enumerate(caps)]
    df = spark.createDataFrame(rows, "source string, capacity long, weight long")
    got = {r.source: r for r in epoch_plan(df, budget=budget).collect()}

    total_cap = sum(caps)
    assert sum(r.tokens_served for r in got.values()) == min(budget, 4 * total_cap)
    for r in got.values():
        assert 0 <= r.tokens_served <= 4 * r.capacity
        if r.capacity:
            assert r.epochs_bp == r.tokens_served * 10000 // r.capacity

    # Python replay of the greedy order (same integer utility key)
    units = sorted(
        (
            (-(w * 5000 ** (e - 1) * 10000 ** (4 - e)), s, e, c)
            for (s, c, w) in rows
            for e in range(1, 5)
        ),
    )
    served = {s: 0 for s, _, _ in rows}
    left = budget
    for _, s, _, c in units:
        take = max(0, min(c, left))
        served[s] += take
        left -= take
    assert {s: r.tokens_served for s, r in got.items()} == served


def test_epoch_plan_big_weight_integer_keys(spark):
    """Weights above ~9000 push the utility key past 2^53, where the
    old F.pow double key became inexact (rounded intermediate +
    engine-divergent double->long casts): near the top of the
    documented weight range (~9.2e6 at the default 1e12 factor) the
    pure-integer key must reproduce the Python integer replay
    exactly."""
    from solana_data_etl_pipeline_spark.operators.text import epoch_plan

    rows = [("a", 100, 8_876_543), ("b", 100, 8_876_544), ("c", 100, 8_876_542)]
    df = spark.createDataFrame(rows, "source string, capacity long, weight long")
    got = {r.source: r.tokens_served for r in epoch_plan(df, budget=1050).collect()}

    units = sorted(
        (-(w * 5000 ** (e - 1) * 10000 ** (4 - e)), s, e, c)
        for (s, c, w) in rows
        for e in range(1, 5)
    )
    served = {s: 0 for s, _, _ in rows}
    left = 1050
    for _, s, _, c in units:
        take = max(0, min(c, left))
        served[s] += take
        left -= take
    assert got == served

    # the overflow guard: a >62-bit factor is rejected, not silently
    # wrapped into a misordered BIGINT key
    import pytest

    with pytest.raises(ValueError, match="62-bit"):
        epoch_plan(df, budget=1, max_epochs=5, decay_bp=100_000)


@given(
    caps=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=6),
    weights=st.lists(st.integers(min_value=1, max_value=9), min_size=6, max_size=6),
    budget=st.integers(min_value=0, max_value=2000),
)
@settings(**SETTINGS)
def test_mixture_waterfill_conservation_laws(spark, caps, weights, budget):
    """For ANY capacity/weight profile: no source exceeds its
    capacity; saturated sources allocate exactly their capacity; and
    total allocation spends min(budget, total capacity) to within one
    rounding unit per unsaturated source (alloc = round(lambda * w))."""
    from solana_data_etl_pipeline_spark.operators.text import mixture_waterfill

    rows = [(f"s{i}", c, weights[i]) for i, c in enumerate(caps)]
    df = spark.createDataFrame(rows, "source string, capacity long, weight long")
    got = mixture_waterfill(df, budget=budget).collect()

    for r in got:
        assert 0 <= r.alloc <= r.capacity
        if r.saturated:
            assert r.alloc == r.capacity
    target = min(budget, sum(caps))
    slack = sum(1 for r in got if not r.saturated)
    assert abs(sum(r.alloc for r in got) - target) <= slack


# ---------------------------------------------------------------------------
# codec round-trips: the three real container formats (WAV / BMP / AVI)
# must restore EXACTLY the pixel/sample bytes that went in, for any
# payload -- these are pure-Python properties (no Spark), so hypothesis
# can sweep sizes including the padding edge cases (partial rows,
# partial frames, empty input handled by the synth operators' 1-unit
# floor upstream).


@given(st.binary(min_size=1, max_size=400))
@settings(max_examples=50, deadline=None)
def test_wav_codec_roundtrip_property(samples):
    from solana_data_etl_pipeline_spark.operators import multimodal as M

    payload = M._wav_encode(samples, 8000)
    m = M._wav_parse(payload)
    assert bytes(m["samples"]) == samples
    assert m["framerate"] == 8000 and m["n_channels"] == 1


@given(st.binary(min_size=1, max_size=400), st.integers(min_value=1, max_value=31))
@settings(max_examples=50, deadline=None)
def test_bmp_codec_roundtrip_property(gray, width):
    """Any width (odd widths exercise the 4-byte row padding) and any
    pixel content round-trip bit-exactly through encode + parse."""
    from solana_data_etl_pipeline_spark.operators import multimodal as M

    h = -(-len(gray) // width)
    gray = gray.ljust(h * width, b"\x00")
    m = M._bmp_parse(M._bmp_encode(gray, width))
    assert m["width"] == width and m["height"] == h
    got = bytes(t[0] for row in m["rows"] for t in row)
    assert got == gray
    assert all(t[0] == t[1] == t[2] for row in m["rows"] for t in row)


@given(
    st.binary(min_size=1, max_size=600),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=50, deadline=None)
def test_avi_codec_roundtrip_property(gray, width, height, fps):
    """Any frame geometry (odd widths exercise DIB row padding; the
    frame count falls out of the payload size) and any pixel content
    round-trip bit-exactly through the AVI mux + demux, with every
    header cross-check (RIFF size, avih/strh/strf agreement, idx1
    count) passing on the muxer's own output."""
    from solana_data_etl_pipeline_spark.operators import multimodal as M

    fpx = width * height
    n = -(-len(gray) // fpx)
    gray = gray.ljust(n * fpx, b"\x00")
    m = M._avi_parse(M._avi_encode(gray, width, height, fps))
    assert m["width"] == width and m["height"] == height
    assert m["n_frames"] == n and m["fps"] == fps
    got = bytes(t[0] for fr in m["frames"] for row in fr for t in row)
    assert got == gray


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=3)),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=0, max_value=400),
)
@settings(max_examples=15, deadline=None)
def test_epoch_expand_matches_python_model(spark, src_spec, budget):
    """epoch_expand realizes epoch_plan under the doc-quantized model:
    for every source, copy counts replay exactly from (epochs_bp, the
    consistent md5 bucket), whatever the plan allocated."""
    import hashlib

    from pyspark.sql import functions as F

    from solana_data_etl_pipeline_spark.operators.text import epoch_expand, epoch_plan

    rows, counts_rows, did = [], [], 0
    for s_ix, (n_docs, w) in enumerate(src_spec):
        src = f"s{s_ix}"
        for _ in range(n_docs):
            rows.append((did, src, "tok " * 4))
            did += 1
        counts_rows.append((src, n_docs * 4, w))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    counts = spark.createDataFrame(
        counts_rows, "source string, capacity long, weight long"
    )
    plan = epoch_plan(counts, budget=budget)
    got = {
        (r.doc_id, r.copy)
        for r in epoch_expand(docs, plan).collect()
    }
    bp = {r.source: r.epochs_bp for r in plan.collect()}
    want = set()
    for d, src, _ in rows:
        full, frac = divmod(bp[src], 10000)
        extra = int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 10000 < frac
        for c in range(1, int(full) + int(extra) + 1):
            want.add((d, c))
    assert got == want
