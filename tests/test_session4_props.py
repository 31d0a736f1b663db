"""Python brute-force property pins for the round-7 session-4 operators
(FIFO lot matching, multi-outcome overround, KMV sketch, TVD drift,
Heaps growth, winnowing, dup-graph BFS): each must equal a direct
recomputation of its declared formula on crafted adversarial inputs.
The DuckDB parity suite proves Spark == oracle; these prove both == the
formula — the guard against 'both engines wrong the same way'."""

from __future__ import annotations

import pandas as pd
import pytest

TS0 = 1_700_000_000_000_000  # µs


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, cents)."""
    pdf = pd.DataFrame(
        [(e, t * 1000, u, ty, c / 100.0) for e, t, u, ty, c in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).selectExpr(
        "event_id",
        "timestamp_micros(cast(ts div 1000 as long)) as ts",
        "user_id",
        "event_type",
        "value",
    ).write.parquet(f"{sf_dir}/events.parquet")
    return sf_dir


def _write_documents(spark, tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _fifo_queue_walk(fills):
    """fills: list of (side, qty, px) in time order. Classic long-only
    FIFO queue walk — a sell matches only inventory open AT ITS TIME."""
    from collections import deque

    buys = deque()
    pnl = matched = bought = sold = 0
    for side, qty, px in fills:
        if side == "B":
            bought += qty
            buys.append([qty, px])
        else:
            sold += qty
            remaining = qty
            while remaining and buys:
                lot = buys[0]
                take = min(lot[0], remaining)
                pnl += take * (px - lot[1])
                matched += take
                lot[0] -= take
                remaining -= take
                if lot[0] == 0:
                    buys.popleft()
    return {
        "bought_qty": bought,
        "sold_qty": sold,
        "matched_qty": matched,
        "realized_pnl_cents": pnl,
        "open_long_qty": bought - matched,
        "unmatched_sold_qty": sold - matched,
    }


def _fifo_ordinal(fills):
    """Direction-neutral ordinal FIFO — the operator's declared
    semantics: the j-th unit sold matches the j-th unit bought,
    regardless of arrival order (== queue walk on no-short tapes)."""
    buy_units, sell_units = [], []
    for side, qty, px in fills:
        (buy_units if side == "B" else sell_units).extend([px] * qty)
    matched = min(len(buy_units), len(sell_units))
    pnl = sum(sell_units[j] - buy_units[j] for j in range(matched))
    return {
        "bought_qty": len(buy_units),
        "sold_qty": len(sell_units),
        "matched_qty": matched,
        "realized_pnl_cents": pnl,
        "open_long_qty": len(buy_units) - matched,
        "unmatched_sold_qty": len(sell_units) - matched,
    }


def test_fifo_pnl_matches_queue_walk(spark, tmp_path):
    """Partial lot splits (one sell spanning two buys), an oversold
    account (unmatched sells), and a buy-only account (all open)."""
    from financial_arbitrage_data_pipeline_spark.operators.portfolio import (
        fifo_realized_pnl,
    )

    # qty = event_id % 5 + 1 — pick event_ids to control qty exactly
    rows = [
        # user 1: buy 3@100, buy 2@110, sell 4@105 -> pnl 3*5 + 1*(-5) = 10
        (2, TS0 + 1, 1, "purchase", 100),   # qty 3
        (1, TS0 + 2, 1, "purchase", 110),   # qty 2
        (3, TS0 + 3, 1, "click", 105),      # qty 4
        # user 2: sell 5@90 with only 1@80 bought -> 4 unmatched sells
        (5, TS0 + 1, 2, "purchase", 80),    # qty 1
        (4, TS0 + 2, 2, "click", 90),       # qty 5
        # user 3: buys only
        (7, TS0 + 1, 3, "purchase", 70),    # qty 3
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in fifo_realized_pnl(spark, sf_dir).toPandas().to_dict("records")
    }
    per_user = {
        1: [("B", 3, 100), ("B", 2, 110), ("S", 4, 105)],
        2: [("B", 1, 80), ("S", 5, 90)],
        3: [("B", 3, 70)],
    }
    for u, fills in per_user.items():
        want = _fifo_queue_walk(fills)  # all no-short-at-match tapes here
        assert want == _fifo_ordinal(fills), u  # semantics agree on these
        for k, v in want.items():
            assert got[u][k] == v, (u, k, got[u], want)


def test_fifo_pnl_property_random_tapes(spark, tmp_path):
    """40 seeded-random fill tapes (one per account, in ONE job) == the
    ordinal brute force; accounts whose inventory never goes negative
    must ALSO equal the classic time-ordered queue walk (the declared
    equivalence)."""
    import random

    from financial_arbitrage_data_pipeline_spark.operators.portfolio import (
        fifo_realized_pnl,
    )

    rng = random.Random(20260815)
    rows, want, no_short = [], {}, {}
    eid = 0
    for u in range(1, 41):
        seq = []
        inv = 0
        for i in range(rng.randint(1, 20)):
            qmod = rng.randrange(5)
            px = rng.randint(1, 500)
            is_buy = rng.random() < 0.55
            # event_id ≡ qmod (mod 5), globally unique, increasing in time
            e = eid * 5 + qmod
            eid += 1
            rows.append((e, TS0 + i, u, "purchase" if is_buy else "click", px))
            seq.append(("B" if is_buy else "S", qmod + 1, px))
            inv += (qmod + 1) if is_buy else -(qmod + 1)
            if inv < 0:
                no_short[u] = False
        want[u] = _fifo_ordinal(seq)
        if no_short.get(u, True):
            assert want[u] == _fifo_queue_walk(seq), u
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in fifo_realized_pnl(spark, sf_dir).toPandas().to_dict("records")
    }
    assert set(got) == set(want)
    for u, w in want.items():
        for k, v in w.items():
            assert got[u][k] == v, (u, k, got[u], w)


def test_overround_latest_quote_and_completeness(spark, tmp_path):
    """Same-µs tie broken by event_id; a stale cheap quote must NOT
    produce a phantom dutch book; missing outcome -> incomplete."""
    from financial_arbitrage_data_pipeline_spark.operators.portfolio import (
        _PAYOUT_CENTS,
        implied_overround_book,
    )

    rows = [
        # market 1: complete, all latest asks tiny -> dutch book
        (1, TS0, 1, "click", 100),
        (2, TS0, 1, "error", 200),
        (3, TS0, 1, "purchase", 300),
        (4, TS0, 1, "signup", 400),
        (5, TS0, 1, "view", 500),
        # market 1 stale expensive quote, earlier ts — must be ignored
        (0, TS0 - 10, 1, "view", 90_000),
        # same-µs tie on 'click': higher event_id wins (price 150)
        (6, TS0, 1, "click", 150),
        # market 2: only 4 outcomes -> incomplete, never dutch
        (7, TS0, 2, "click", 10),
        (8, TS0, 2, "error", 10),
        (9, TS0, 2, "purchase", 10),
        (10, TS0, 2, "signup", 10),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["market_id"]: r
        for r in implied_overround_book(spark, sf_dir).toPandas().to_dict("records")
    }
    m1 = got[1]
    assert m1["n_outcomes"] == 5 and m1["is_complete"]
    assert m1["sum_ask_cents"] == 150 + 200 + 300 + 400 + 500
    assert m1["is_dutch_book"]
    assert m1["guaranteed_profit_cents"] == _PAYOUT_CENTS - 1550
    m2 = got[2]
    assert m2["n_outcomes"] == 4 and not m2["is_complete"] and not m2["is_dutch_book"]
    assert m2["guaranteed_profit_cents"] == 0


def _tok_hash(token, mod=1_000_000_007):
    h = 0
    for ch in token:
        h = (h * 131 + ord(ch)) % mod
    return h


def test_kmv_unsaturated_is_exact_and_saturated_matches_formula(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.distributional import (
        _HASH_MOD,
        _KMV_K,
        kmv_distinct_sketch,
    )

    few = "alpha beta gamma alpha"                      # 3 distinct
    many = " ".join(f"tok{i}" for i in range(200))      # 200 distinct
    rows = [(0, few, "xx"), (1, many, "yy")]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = {
        r["lang"]: r
        for r in kmv_distinct_sketch(spark, sf_dir).toPandas().to_dict("records")
    }
    assert got["xx"]["n_distinct"] == 3
    assert got["xx"]["est_distinct"] == 3.0  # unsaturated -> exact
    hs = sorted({_tok_hash(t) for t in many.split(" ")})
    kth = hs[_KMV_K - 1]
    assert got["yy"]["kth_min_hash"] == kth
    assert got["yy"]["est_distinct"] == pytest.approx((_KMV_K - 1) * _HASH_MOD / kth)


def test_tvd_zero_for_identical_halves_one_for_disjoint(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.distributional import (
        distribution_drift_tvd,
    )

    rows = []
    eid = 0
    # 'click': identical price mix in both halves -> tvd 0
    for t in (TS0, TS0 + 1_000_000):
        for px in (100, 5000, 100):
            rows.append((eid, t, 1, "click", px))
            eid += 1
    # 'view': early all cheap, late all expensive -> tvd 1
    for _ in range(3):
        rows.append((eid, TS0, 1, "view", 100)); eid += 1
        rows.append((eid, TS0 + 1_000_000, 1, "view", 40_000)); eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in distribution_drift_tvd(spark, sf_dir).toPandas().to_dict("records")
    }
    assert got["click"]["tvd"] == 0.0 and got["click"]["tvd_numer"] == 0
    assert got["view"]["tvd"] == 1.0
    assert got["view"]["n_early"] == 3 and got["view"]["n_late"] == 3


def test_heaps_growth_matches_bruteforce(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.distributional import (
        _N_CHECKPOINTS,
        heaps_vocab_growth,
    )

    texts = [
        "a b c",        # doc 0
        "a b d",        # doc 1: +1 type
        "a a a",        # doc 2: +0
        "e f",          # doc 3: +2
        "g",            # doc 4: +1
    ]
    rows = [(i, t, "xx") for i, t in enumerate(texts)]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = heaps_vocab_growth(spark, sf_dir).toPandas()
    lo, hi = 0, len(texts) - 1
    for _, r in got.iterrows():
        k = int(r["checkpoint"])
        thr = lo + ((hi - lo) * k) // _N_CHECKPOINTS
        pref = texts[: thr + 1]
        want_vocab = len({t for txt in pref for t in txt.split(" ")})
        want_tokens = sum(len(txt.split(" ")) for txt in pref)
        assert int(r["n_docs"]) == thr + 1
        assert int(r["n_tokens"]) == want_tokens, (k, thr)
        assert int(r["vocab_size"]) == want_vocab, (k, thr)


def _winnow_bruteforce(text, k=5, w=4, mod=1_000_000_007):
    codes = [ord(c) for c in text]
    grams = []
    for i in range(len(codes) - k + 1):
        h = 0
        for x in codes[i : i + k]:
            h = (h * 131 + x) % mod
        grams.append(h)
    fps = []
    for j in range(len(grams) - w + 1):
        win = grams[j : j + w]
        m = min(win)
        fps.append(j + win.index(m))  # leftmost minimum
    sel = sorted(set(fps))
    return {
        "n_grams": len(grams),
        "n_windows": max(len(grams) - w + 1, 0),
        "n_fingerprints": len(sel),
        "fp_hash_sum": sum(grams[i] for i in sel),
        "fp_hash_min": min((grams[i] for i in sel), default=-1),
    }


def test_winnowing_matches_bruteforce_on_adversarial_strings(spark, tmp_path):
    """Periodic strings (constant runs -> every window min ties left),
    the guarantee boundary length k+w-1, and sub-k strings."""
    from financial_arbitrage_data_pipeline_spark.operators.dedup_ext import (
        winnowing_fingerprints,
    )

    texts = [
        "aaaaaaaaaaaa",          # all gram hashes equal -> leftmost ties
        "abcabcabcabc",          # period 3
        "mississippi river flows", # natural
        "abcdefgh",              # exactly k+w-1 = 8 chars -> 1 window
        "abcd",                  # < k -> no grams
        "",                      # empty
    ]
    rows = [(i, t, "xx") for i, t in enumerate(texts)]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = {
        int(r["doc_id"]): r
        for r in winnowing_fingerprints(spark, sf_dir).toPandas().to_dict("records")
    }
    for i, t in enumerate(texts):
        want = _winnow_bruteforce(t)
        for key, v in want.items():
            assert got[i][key] == v, (i, t, key, got[i], want)


def test_winnowing_property_random_texts(spark, tmp_path):
    """60 seeded-random low-alphabet texts (hash-collision-rich, tie-
    heavy) in ONE job == the Python reference implementation."""
    import random

    from financial_arbitrage_data_pipeline_spark.operators.dedup_ext import (
        winnowing_fingerprints,
    )

    rng = random.Random(42)
    texts = [
        "".join(rng.choice("abc ") for _ in range(rng.randint(0, 40)))
        for _ in range(60)
    ]
    rows = [(i, t, "xx") for i, t in enumerate(texts)]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = {
        int(r["doc_id"]): r
        for r in winnowing_fingerprints(spark, sf_dir).toPandas().to_dict("records")
    }
    for i, t in enumerate(texts):
        want = _winnow_bruteforce(t)
        for key, v in want.items():
            assert got[i][key] == v, (i, repr(t), key, got[i], want)


def test_bfs_distances_on_crafted_duplicate_chain(spark, tmp_path):
    """Seed doc (id 0 ≡ 0 mod 97) with two identical near-dups: both at
    dist 1; an unrelated doc is absent; an isolated seed is at dist 0."""
    from financial_arbitrage_data_pipeline_spark.operators.dedup_ext import (
        dup_graph_bfs_distance,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, dup, "xx"),                     # seed, in a 3-clique
        (1, dup, "xx"),
        (2, dup, "xx"),
        (3, "completely different text about market microstructure", "xx"),
        (97, "another isolated seed document with unique words", "xx"),
    ]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = {
        int(r["doc_id"]): int(r["dist"])
        for r in dup_graph_bfs_distance(spark, sf_dir).toPandas().to_dict("records")
    }
    assert got[0] == 0 and got[97] == 0
    assert got[1] == 1 and got[2] == 1
    assert 3 not in got


def test_book_depth_rebuild_overcancel_and_crossed_book(spark, tmp_path):
    """Over-cancelled level (net < 0) must count but not contribute
    depth; a crossed book (best bid above best ask) must report its
    negative spread, not hide it."""
    from financial_arbitrage_data_pipeline_spark.operators.portfolio import (
        book_depth_rebuild,
    )

    # side = event_id parity (even bid / odd ask); qty = event_id%7+1;
    # view/click/signup add, error/purchase cancel; level = cents div 1000
    rows = [
        # market 1: bid adds at level 5 (qty 3+2), ask add at level 7 (qty 2)
        (2, TS0 + 1, 1, "view", 5_000),      # bid L5 +3
        (8, TS0 + 2, 1, "click", 5_500),     # bid L5 +2  (8%7+1=2)
        (1, TS0 + 3, 1, "signup", 7_000),    # ask L7 +2
        # over-cancel ask level 9: cancel 4 with nothing resting
        (3, TS0 + 4, 1, "error", 9_000),     # ask L9 -4
        # market 2: crossed — bid resting at L9, ask resting at L5
        (16, TS0 + 1, 2, "view", 9_000),     # bid L9 +3
        (15, TS0 + 2, 2, "signup", 5_000),   # ask L5 +2
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["market_id"]: r
        for r in book_depth_rebuild(spark, sf_dir).toPandas().to_dict("records")
    }
    m1 = got[1]
    assert m1["best_bid_level"] == 5 and m1["best_ask_level"] == 7
    assert m1["spread_levels"] == 2
    assert m1["bid_depth"] == 5 and m1["ask_depth"] == 2
    assert m1["n_overcancelled_levels"] == 1
    m2 = got[2]
    assert m2["best_bid_level"] == 9 and m2["best_ask_level"] == 5
    assert m2["spread_levels"] == -4  # crossed book reported, not hidden
    assert m2["n_overcancelled_levels"] == 0


def _var_cvar_bruteforce(cents_seq, pct=95):
    losses = [
        cents_seq[i - 1] - cents_seq[i] for i in range(1, len(cents_seq))
    ]
    if not losses:
        return None
    losses.sort()
    n = len(losses)
    r = (pct * n + 99) // 100  # ceil(pct*n/100), 1-indexed
    tail = losses[r - 1 :]
    return {
        "n_moves": n,
        "var95_cents": losses[r - 1],
        "cvar95_numer": sum(tail),
        "cvar95_cents": sum(tail) / len(tail),
    }


def test_var_cvar_matches_bruteforce(spark, tmp_path):
    """Small-n rank edges (n=1..4 moves: ceil rounds up hard), a
    duplicate-loss tie, and an all-gains tape (negative VaR)."""
    import random

    from financial_arbitrage_data_pipeline_spark.operators.riskstats import (
        var_cvar_per_pair,
    )

    rng = random.Random(7)
    tapes = {
        1: [100, 90],                    # one move, loss +10
        2: [100, 90, 90, 80],            # tie losses (10, 0, 10)
        3: [50, 60, 70, 80, 95],         # all gains -> negative losses
        4: [rng.randint(1, 300) for _ in range(37)],
    }
    rows = []
    eid = 0
    for u, seq in tapes.items():
        for i, c in enumerate(seq):
            rows.append((eid, TS0 + i, u, "view", c))
            eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in var_cvar_per_pair(spark, sf_dir).toPandas().to_dict("records")
    }
    for u, seq in tapes.items():
        want = _var_cvar_bruteforce(seq)
        assert got[u]["n_moves"] == want["n_moves"], u
        assert got[u]["var95_cents"] == want["var95_cents"], u
        assert got[u]["cvar95_numer"] == want["cvar95_numer"], u
        assert got[u]["cvar95_cents"] == pytest.approx(want["cvar95_cents"]), u


def test_spearman_monotone_ties_constant(spark, tmp_path):
    """rho = +1 on a strictly rising tape, -1 on falling, NULL on a
    constant tape; a tie-heavy tape matches the average-rank formula."""
    from financial_arbitrage_data_pipeline_spark.operators.riskstats import (
        spearman_rank_corr,
    )

    tapes = {
        1: [10, 20, 30, 40, 50],
        2: [50, 40, 30, 20, 10],
        3: [7, 7, 7, 7],
        4: [10, 20, 20, 20, 30, 10],
    }
    rows = []
    eid = 0
    for u, seq in tapes.items():
        for i, c in enumerate(seq):
            rows.append((eid, TS0 + i, u, "view", c))
            eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in spearman_rank_corr(spark, sf_dir).toPandas().to_dict("records")
    }
    assert got[1]["spearman_rho"] == pytest.approx(1.0)
    assert got[2]["spearman_rho"] == pytest.approx(-1.0)
    assert pd.isna(got[3]["spearman_rho"])

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    seq = tapes[4]
    x = list(range(1, len(seq) + 1))
    y = avg_ranks(seq)
    n = len(seq)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    syy = sum(v * v for v in y)
    sxy = sum(a * b for a, b in zip(x, y))
    want = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    assert got[4]["spearman_rho"] == pytest.approx(want)


def test_exact_median_bisect_odd_even_duplicates(spark, tmp_path):
    """Lower-median convention on even counts; heavy duplicates (the
    bisection must land on an attained value)."""
    from financial_arbitrage_data_pipeline_spark.operators.riskstats import (
        exact_median_bisect,
    )

    cases = [
        [5, 1, 9],                 # odd -> 5
        [4, 1, 9, 2],              # even -> lower median 2
        [7, 7, 7, 1, 100, 7],      # duplicates -> 7
    ]
    for seq in cases:
        d = tmp_path / f"m{len(seq)}_{seq[0]}"
        d.mkdir()
        rows = [(i, TS0 + i, 1, "view", c) for i, c in enumerate(seq)]
        sf_dir = _write_events(spark, d, rows)
        got = exact_median_bisect(spark, sf_dir).toPandas().to_dict("records")[0]
        want = sorted(seq)[(len(seq) + 1) // 2 - 1]
        assert got["n"] == len(seq) and got["median_cents"] == want, (seq, got)


def test_wash_trade_binning_catches_cross_bin_pairs(spark, tmp_path):
    """A (buy, sell) pair 59 minutes apart but straddling an hour-bin
    boundary MUST match (the ±1 bin explode exists for this); a pair 61
    minutes apart must not; same-level requirement enforced."""
    from financial_arbitrage_data_pipeline_spark.operators.surveillance import (
        wash_trade_detection,
    )

    rows = [
        # user 1: buy at t=3590s (bin 0), sell at t=3620s (bin 1): 30s apart
        (2, 3_590 * 1_000_000, 1, "purchase", 10_000),
        (4, 3_620 * 1_000_000, 1, "click", 10_250),  # same level 20 (div 500)
        # user 2: same level but 61 minutes apart -> no match
        (7, 0, 2, "purchase", 10_000),
        (9, 61 * 60 * 1_000_000, 2, "click", 10_000),
        # user 3: 1 minute apart but different levels -> no match
        (12, 0, 3, "purchase", 10_000),
        (14, 60 * 1_000_000, 3, "click", 20_000),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in wash_trade_detection(spark, sf_dir).toPandas().to_dict("records")
    }
    assert got[1]["n_wash_pairs"] == 1
    assert got[1]["washed_qty"] == min(2 % 5 + 1, 4 % 5 + 1)  # min(3, 5... )
    assert 2 not in got and 3 not in got


def test_hoeffding_gate_certain_and_uncertain(spark, tmp_path):
    """A huge mean gap with tight range must fire; identical arms must
    not; epsilon matches the closed form."""
    import math

    from financial_arbitrage_data_pipeline_spark.operators.stats_ext import (
        _HOEFF_LN_2_OVER_DELTA,
        ab_test_hoeffding_gate,
    )

    rows = []
    eid = 0
    # 'click': arm0 (even users) all 100 cents, arm1 all 200 -> range 100,
    # gap 100 > eps for n=40/arm
    for i in range(40):
        rows.append((eid, i, 2, "click", 100)); eid += 1
        rows.append((eid, i, 3, "click", 200)); eid += 1
    # 'view': both arms identical -> gap 0, never significant
    for i in range(10):
        rows.append((eid, i, 2, "view", 150)); eid += 1
        rows.append((eid, i, 3, "view", 150)); eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in ab_test_hoeffding_gate(spark, sf_dir).toPandas().to_dict("records")
    }
    c = got["click"]
    eps = (200 - 100) * math.sqrt(_HOEFF_LN_2_OVER_DELTA * (1 / 40 + 1 / 40) / 2)
    assert c["mean_gap"] == pytest.approx(100.0)
    assert c["epsilon"] == pytest.approx(eps)
    assert bool(c["significant"]) == (100.0 > eps) == True  # noqa: E712
    v = got["view"]
    assert v["mean_gap"] == 0.0 and not v["significant"]


def test_qq_deciles_match_bruteforce(spark, tmp_path):
    """Crafted 20-row halves: every decile must be the exact attained
    order statistic at rank ceil(k*n/10)."""
    import random

    from financial_arbitrage_data_pipeline_spark.operators.stats_ext import (
        qq_drift_deciles,
    )

    rng = random.Random(3)
    early = [rng.randint(1, 500) for _ in range(20)]
    late = [rng.randint(200, 700) for _ in range(17)]
    rows = []
    eid = 0
    for i, c in enumerate(early):
        rows.append((eid, i, 1, "view", c)); eid += 1
    base = 10_000_000  # seconds later -> late half
    for i, c in enumerate(late):
        rows.append((eid, base + i, 1, "view", c)); eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        int(r["k"]): r
        for r in qq_drift_deciles(spark, sf_dir).toPandas().to_dict("records")
        if r["event_type"] == "view"
    }
    se, sl = sorted(early), sorted(late)
    for k in range(1, 10):
        qe = se[(k * len(se) + 9) // 10 - 1]
        ql = sl[(k * len(sl) + 9) // 10 - 1]
        assert got[k]["q_early"] == qe, k
        assert got[k]["q_late"] == ql, k
        assert got[k]["decile_gap"] == abs(qe - ql), k


def test_bbit_estimate_identical_and_disjoint_docs(spark, tmp_path):
    """Identical docs: every bit agrees, est_1bit == 1 == jaccard.
    The audit columns must satisfy est_1bit = 2*(bits/16) - 1 exactly."""
    from financial_arbitrage_data_pipeline_spark.operators.sketch_ext import (
        bbit_minhash_estimate,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, dup, "xx"), (1, dup, "xx"),
            (2, "one two three four five six seven eight nine ten", "xx")]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = bbit_minhash_estimate(spark, sf_dir).toPandas().to_dict("records")
    pairs = {(int(r["doc_a"]), int(r["doc_b"])): r for r in got}
    r01 = pairs[(0, 1)]
    assert r01["n_bits_equal"] == 16
    assert r01["est_1bit"] == 1.0 and r01["est_full"] == 1.0
    assert r01["jaccard"] == 1.0 and r01["abs_err_1bit"] == 0.0
    for r in got:
        assert r["est_1bit"] == 2 * (r["n_bits_equal"] / 16) - 1


def _write_embeddings(spark, tmp_path, vecs):
    """vecs: dict vec_id -> list[float] (64 dims)."""
    rows = [(i, [float(x) for x in v], 0) for i, v in vecs.items()]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")
    return sf_dir


def _eig_bruteforce(vecs, rounds=3, scale=1 << 16, quant=1000):
    import struct

    def f32(x):  # parquet stores float32: quantize through the same width
        return struct.unpack("f", struct.pack("f", x))[0]

    q = {
        (i, j + 1): int(round(f32(x) * quant))
        for i, v in vecs.items()
        for j, x in enumerate(v)
    }
    dims = max(j for (_, j) in q)
    v = {j: scale for j in range(1, dims + 1)}
    for _ in range(rounds):
        s = {}
        for (i, j), qv in q.items():
            s[i] = s.get(i, 0) + qv * v[j]
        w = {j: 0 for j in v}
        for (i, j), qv in q.items():
            w[j] += qv * s[i]
        m = max(abs(x) for x in w.values())
        step = m // scale + 1
        v = {j: (abs(x) // step if x >= 0 else -(abs(x) // step)) for j, x in w.items()}
    return v


def test_power_iteration_matches_bruteforce_and_finds_direction(spark, tmp_path):
    """Integer rounds == the Python recomputation exactly, AND the
    recovered direction aligns (cosine > 0.99) with the dominant axis of
    a cloud built to have one: strong variance on dims 1-2, noise
    elsewhere."""
    import math
    import random

    from financial_arbitrage_data_pipeline_spark.operators.linalg import (
        embedding_top_eigvec,
    )

    rng = random.Random(11)
    vecs = {}
    for i in range(12):
        t = rng.uniform(-1, 1)
        v = [t * 0.9, t * 0.45] + [rng.uniform(-0.02, 0.02) for _ in range(62)]
        vecs[i] = v
    sf_dir = _write_embeddings(spark, tmp_path, vecs)
    got = {
        int(r["dim"]): int(r["v"])
        for r in embedding_top_eigvec(spark, sf_dir).toPandas().to_dict("records")
    }
    want = _eig_bruteforce(vecs)
    assert got == want
    # direction check: true dominant direction is (0.9, 0.45, 0...) normalized
    gv = [got[j] for j in sorted(got)]
    norm = math.sqrt(sum(x * x for x in gv))
    true = [0.9, 0.45] + [0.0] * 62
    tn = math.sqrt(sum(x * x for x in true))
    cos = abs(sum(a * b for a, b in zip(gv, true)) / (norm * tn))
    assert cos > 0.99, cos


def test_weighted_median_matches_bruteforce(spark, tmp_path):
    """Weights must shift the median away from the unweighted one; the
    threshold is ceil(total/2) on an attained value."""
    from financial_arbitrage_data_pipeline_spark.operators.stats_ext import (
        weighted_median_per_type,
    )

    # qty = event_id % 5 + 1: one heavy cheap fill vs many light rich ones
    rows = [
        (4, 0, 1, "click", 100),    # wt 5 at 100
        (0, 1, 1, "click", 900),    # wt 1
        (5, 2, 1, "click", 901),    # wt 1
        (10, 3, 1, "click", 902),   # wt 1
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in weighted_median_per_type(spark, sf_dir).toPandas().to_dict("records")
    }
    # total weight 8 -> threshold ceil(8/2)=4 -> cum at 100 is 5 >= 4
    assert got["click"]["total_weight"] == 8
    assert got["click"]["weighted_median_cents"] == 100


def test_winnow_match_rare_substring_pairs_boilerplate_dropped(spark, tmp_path):
    """Two docs sharing a long RARE substring must pair; a template
    substring shared by 12 docs must be suppressed by the df <= 10 cap
    (and produce no pairs among docs sharing only it)."""
    from financial_arbitrage_data_pipeline_spark.operators.winnow_match import (
        winnow_match_pairs,
    )

    rare = "xqzvkwpjmflrtbgh distinctive shared passage 9381"
    boiler = "standard header boilerplate line for every document here"
    rows = [(0, rare + " tail zero", "xx"), (1, "head one " + rare, "xx")]
    # 12 docs sharing ONLY the boilerplate (> _MAX_DF = 10)
    rows += [(10 + i, boiler + f" unique{i} suffix{i*7}", "xx") for i in range(12)]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): int(r["n_shared_fps"])
        for r in winnow_match_pairs(spark, sf_dir).toPandas().to_dict("records")
    }
    assert (0, 1) in got and got[(0, 1)] >= 3
    for (a, b) in got:
        assert not (a >= 10 and b >= 10), (a, b)  # boilerplate-only pairs killed


def _position_bruteforce(fills):
    """fills: (dq) list in time order."""
    pos = 0
    prev = 0
    maxl = None
    out = {
        "n_fills": 0, "bought_qty": 0, "sold_qty": 0,
        "max_long": None, "max_short": None,
        "n_flips": 0, "n_flat_touches": 0, "ending_position": 0,
    }
    for dq in fills:
        prev = pos
        pos += dq
        out["n_fills"] += 1
        if dq > 0:
            out["bought_qty"] += dq
        else:
            out["sold_qty"] += -dq
        out["max_long"] = pos if out["max_long"] is None else max(out["max_long"], pos)
        out["max_short"] = pos if out["max_short"] is None else min(out["max_short"], pos)
        if (prev > 0 and pos < 0) or (prev < 0 and pos > 0):
            out["n_flips"] += 1
        if pos == 0:
            out["n_flat_touches"] += 1
        out["ending_position"] = pos
    return out


def test_position_timeline_flips_and_flat_touches(spark, tmp_path):
    """A flip THROUGH zero counts; closing exactly ONTO zero then
    re-opening the same way does not; brute-force parity on a random
    tape."""
    import random

    from financial_arbitrage_data_pipeline_spark.operators.positions import (
        position_exposure_timeline,
    )

    tapes = {
        # qty = event_id % 5 + 1; dq sign by type
        1: [("purchase", 2), ("click", 4), ("purchase", 3)],   # +3 -5 +4: flips at -2 and back at +2
        2: [("purchase", 2), ("click", 2), ("purchase", 2)],   # +3 -3 +3: onto zero, NO flip
    }
    rng = random.Random(5)
    tapes[3] = [
        ("purchase" if rng.random() < 0.5 else "click", rng.randrange(5))
        for _ in range(30)
    ]
    rows, eid = [], 0
    for u, seq in tapes.items():
        for i, (ty, qmod) in enumerate(seq):
            rows.append((eid * 5 + qmod, TS0 + i, u, ty, 100))
            eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in position_exposure_timeline(spark, sf_dir).toPandas().to_dict("records")
    }
    for u, seq in tapes.items():
        fills = [(q + 1) if ty == "purchase" else -(q + 1) for ty, q in seq]
        want = _position_bruteforce(fills)
        for k, v in want.items():
            assert got[u][k] == v, (u, k, got[u], want)
    assert got[1]["n_flips"] == 2
    assert got[2]["n_flips"] == 0 and got[2]["n_flat_touches"] == 1


def test_decile_lift_hand_computed(spark, tmp_path):
    """20 accounts, top-score half converts: decile 1-5 lift = 2, 6-10
    lift = 0; equal-count deciles with deterministic tie order."""
    from financial_arbitrage_data_pipeline_spark.operators.stats_ext import (
        score_decile_lift,
    )

    rows, eid = [], 0
    for u in range(1, 21):
        score = 100 * (21 - u)  # u=1 highest score
        rows.append((eid, TS0 + u, u, "view", score)); eid += 1
        if u <= 10:  # top half converts
            rows.append((eid, TS0 + u, u, "purchase", 1)); eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        int(r["decile"]): r
        for r in score_decile_lift(spark, sf_dir).toPandas().to_dict("records")
    }
    assert set(got) == set(range(1, 11))
    for d in range(1, 6):
        assert got[d]["n_users"] == 2 and got[d]["n_converted"] == 2
        assert got[d]["conv_rate"] == 1.0 and got[d]["lift"] == pytest.approx(2.0)
    for d in range(6, 11):
        assert got[d]["n_converted"] == 0 and got[d]["lift"] == 0.0


def test_lateness_profile_in_order_and_known_stragglers(spark, tmp_path):
    """Perfectly in-order feed -> zero lateness everywhere; a feed with
    two known stragglers -> exact max/p99/counters."""
    from financial_arbitrage_data_pipeline_spark.operators.stats_ext import (
        event_lateness_profile,
    )

    rows = []
    # 'view': event_id order == ts order (in-order feed)
    for i in range(10):
        rows.append((i, 1000 + i, 1, "view", 100))
    # 'click': two stragglers — event 14 is 90s late, event 17 is 2s late
    ts = {10: 0, 11: 10, 12: 20, 13: 120, 14: 30, 15: 130, 16: 140, 17: 138}
    for eid, t in ts.items():
        rows.append((eid, t, 1, "click", 100))
    sf_dir = _write_events(spark, tmp_path, [(e, t, u, ty, c) for (e, t, u, ty, c) in rows])
    got = {
        r["event_type"]: r
        for r in event_lateness_profile(spark, sf_dir).toPandas().to_dict("records")
    }
    v = got["view"]
    assert v["n_out_of_order"] == 0 and v["max_lateness_us"] == 0
    assert v["p99_lateness_us"] == 0 and v["n_late_over_1m"] == 0
    c = got["click"]
    # lateness: e14 arrives after seen_max=120 -> 90; e17 after 140 -> 2
    assert c["n_out_of_order"] == 2
    assert c["max_lateness_us"] == 90
    # n=8, p99 rank = ceil(0.99*8)=8 -> the max
    assert c["p99_lateness_us"] == 90
    assert c["n_late_over_1m"] == 0  # 90 µs here, not seconds


def test_keep_best_quality_beats_min_doc_id(spark, tmp_path):
    """A cluster where the LATER doc is higher quality: best_doc must be
    the diverse long one, not the min doc_id; chars_saved exact."""
    from financial_arbitrage_data_pipeline_spark.operators.dedup_quality import (
        dedup_keep_best_quality,
    )

    # identical shingle sets -> guaranteed cluster; doc 5 has extra
    # repeated tokens (same shingles via duplication of the full text)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(5, base, "xx"), (6, base, "xx")]
    sf_dir = _write_documents(spark, tmp_path, rows)
    got = dedup_keep_best_quality(spark, sf_dir).toPandas().to_dict("records")
    by_cluster = {int(r["cluster_id"]): r for r in got}
    assert 5 in by_cluster
    r = by_cluster[5]
    # identical docs: equal quality -> tie broken by lowest doc_id
    assert r["best_doc"] == 5
    assert r["cluster_size"] == 2
    assert r["chars_saved"] == len(base)


def test_execution_shortfall_arrival_benchmark(spark, tmp_path):
    """Arrival = FIRST quote of the hour (not min price); hours without
    fills or without quotes are excluded; sign convention pinned."""
    from financial_arbitrage_data_pipeline_spark.operators.portfolio import (
        execution_shortfall_hourly,
    )

    H = 3_600 * 1_000_000
    rows = [
        # user 1, hour 0: quotes 100 (first) then 50 (lower, later) —
        # arrival must be 100; fills: 3@110 -> shortfall = 330 - 300 = 30
        (0, 10, 1, "view", 100),
        (5, 20, 1, "view", 50),
        (2, 30, 1, "purchase", 110),         # qty 3
        # user 1, hour 1: fill but NO quote -> excluded
        (7, H + 10, 1, "purchase", 200),
        # user 2, hour 0: quote but no fill -> excluded
        (10, 10, 2, "view", 100),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = execution_shortfall_hourly(spark, sf_dir).toPandas().to_dict("records")
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["hr"] == 0
    assert r["arrival_px"] == 100 and r["fill_qty"] == 3
    assert r["shortfall_cents"] == 3 * 110 - 3 * 100 == 30
    assert r["shortfall_bp"] == pytest.approx((110 - 100) / 100 * 10000)


def test_streaming_book_depth_equals_batch_rebuild(spark, sf_dir):
    """The continuous aggregate must be BIT-IDENTICAL to the batch
    event-sourced rebuild on the same tape — chunk boundaries invisible
    by additive algebra."""
    from financial_arbitrage_data_pipeline_spark.operators.portfolio import (
        book_depth_rebuild,
    )
    from financial_arbitrage_data_pipeline_spark.operators.streaming_queries import (
        streaming_book_depth,
    )

    batch = book_depth_rebuild(spark, sf_dir).toPandas()
    stream = streaming_book_depth(spark, sf_dir).toPandas()
    cols = sorted(batch.columns)
    assert sorted(stream.columns) == cols
    b = sorted(map(tuple, batch[cols].itertuples(index=False)), key=repr)
    s = sorted(map(tuple, stream[cols].itertuples(index=False)), key=repr)
    assert b == s


def test_mae_mfe_horizon_edges(spark, tmp_path):
    """Quote exactly AT the 1h horizon counts (inclusive frame); a quote
    1µs past it doesn't; quotes BEFORE the fill never count; fills with
    no forward quote are excluded."""
    from financial_arbitrage_data_pipeline_spark.operators.riskstats import (
        _MAE_HORIZON_US,
        fill_excursion_mae_mfe,
    )

    H = _MAE_HORIZON_US
    rows = [
        # user 1: fill at t=0 px=100; quotes at +1 (90), +H (120), +H+1 (999)
        (0, 10, 1, "view", 500),            # BEFORE the fill: ignored
        (2, 100, 1, "purchase", 100),
        (5, 101, 1, "view", 90),
        (10, 100 + H, 1, "view", 120),      # exactly at horizon: counts
        (15, 100 + H + 1, 1, "view", 999),  # past horizon: ignored
        # user 2: fill with no forward quote -> excluded
        (20, 100, 2, "purchase", 100),
        (25, 50, 2, "view", 70),            # only a backward quote
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = fill_excursion_mae_mfe(spark, sf_dir).toPandas().to_dict("records")
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["fill_px"] == 100
    assert r["mae_cents"] == 100 - 90
    assert r["mfe_cents"] == 120 - 100  # 999 excluded, 120 included


def test_otr_flags_zero_trade_and_high_ratio_days(spark, tmp_path):
    from financial_arbitrage_data_pipeline_spark.operators.surveillance import (
        order_to_trade_ratio,
    )

    D = 86_400 * 1_000_000
    rows = []
    eid = 0
    # user 1 day 0: 60 messages, 1 trade -> otr 60 > 50 -> flagged
    for i in range(59):
        rows.append((eid, i, 1, "view", 100)); eid += 1
    rows.append((eid, 60, 1, "purchase", 100)); eid += 1
    # user 2 day 0: 5 messages, 0 trades -> flagged, otr NULL
    for i in range(5):
        rows.append((eid, i, 2, "click", 100)); eid += 1
    # user 3 day 1: 10 messages, 5 trades -> otr 2, not flagged
    for i in range(5):
        rows.append((eid, D + i, 3, "view", 100)); eid += 1
        rows.append((eid + 1000, D + 10 + i, 3, "purchase", 100)); eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["day"]): r
        for r in order_to_trade_ratio(spark, sf_dir).toPandas().to_dict("records")
    }
    r1 = got[(1, 0)]
    assert r1["n_messages"] == 60 and r1["n_trades"] == 1
    assert r1["otr"] == 60.0 and r1["flagged"]
    r2 = got[(2, 0)]
    assert r2["n_trades"] == 0 and pd.isna(r2["otr"]) and r2["flagged"]
    r3 = got[(3, 1)]
    assert r3["otr"] == 2.0 and not r3["flagged"]


def test_exact_median_histogram_pass_count(spark, tmp_path):
    """VERDICT r9 task 4: the histogram partition must resolve any
    realistic domain in <= 2 histogram passes (vs ~16 bisection scans),
    including a wide-range case that spans multiple first-level
    buckets, and keep the lower-median tie convention."""
    from financial_arbitrage_data_pipeline_spark.operators import riskstats as R

    # wide spread: values up to ~84M cents -> 2 passes (4096^2 > range)
    wide = [0, 1, 843_973_11, 843_973_12, 500_000, 500_000, 7]
    d = tmp_path / "wide"
    d.mkdir()
    rows = [(i, TS0 + i, 1, "view", c) for i, c in enumerate(wide)]
    sf_dir = _write_events(spark, d, rows)
    got = R.exact_median_bisect(spark, sf_dir).toPandas().to_dict("records")[0]
    want = sorted(wide)[(len(wide) + 1) // 2 - 1]
    assert got["median_cents"] == want
    assert 1 <= R._median_passes_last <= 2, R._median_passes_last

    # narrow range -> a single histogram pass (width 1 first round)
    tight = [3, 1, 2, 2, 9]
    d2 = tmp_path / "tight"
    d2.mkdir()
    rows = [(i, TS0 + i, 1, "view", c) for i, c in enumerate(tight)]
    sf_dir2 = _write_events(spark, d2, rows)
    got2 = R.exact_median_bisect(spark, sf_dir2).toPandas().to_dict("records")[0]
    assert got2["median_cents"] == 2
    assert R._median_passes_last == 1, R._median_passes_last
