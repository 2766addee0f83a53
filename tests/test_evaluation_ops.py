"""Round-6 evaluation/governance family: exact ROC-AUC, calibration
bins, cross-source contamination matrix, Stupid Backoff LM scoring,
KMV Jaccard set-algebra — each checked against an independent
numpy/pure-Python replication on the real fixtures."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF, "documents").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def raw(docs):
    return [(r.doc_id, r.text, r.lang, r.source) for r in docs.collect()]


def _clf_score(text: str) -> tuple[int, int]:
    """(score_num, n_tokens) of the md5 linear classifier."""
    toks = text.split(" ")
    num = sum(
        int(hashlib.md5(f"clf:{t}".encode()).hexdigest()[:8], 16) % 1001 - 500
        for t in toks
    )
    return num, len(toks)


def test_roc_auc_matches_sklearn_style_replication(docs, raw):
    from sqlstreamstore_spark.analytics.evaluation import roc_auc

    got = roc_auc(docs).collect()[0]
    pairs = []
    for _id, text, lang, _src in raw:
        num, ntok = _clf_score(text)
        pairs.append((num / ntok, 1 if lang == "en" else 0))
    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    # O(P*N) literal AUC: P(score_pos > score_neg) + 0.5 P(==)
    wins = ties = 0
    for p in pos:
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(got.auc - expect) < 1e-12
    assert got.n_scores == len({s for s, _ in pairs})


def test_calibration_bins_match_replication(docs, raw):
    from sqlstreamstore_spark.analytics.evaluation import calibration_bins

    rows = {r.bucket: r for r in calibration_bins(docs).collect()}
    agg = defaultdict(lambda: [0, 0, []])
    for _id, text, lang, _src in raw:
        num, ntok = _clf_score(text)
        s = num / ntok
        b = math.floor(s / 100.0)
        agg[b][0] += 1
        agg[b][1] += 1 if lang == "en" else 0
        agg[b][2].append(s)
    assert set(rows) == set(agg)
    for b, (n, p, ss) in agg.items():
        r = rows[b]
        assert (r.n_docs, r.n_pos) == (n, p)
        assert r.pos_rate == p / n
        assert r.min_score == min(ss) and r.max_score == max(ss)


def _shingle_set(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_contamination_matrix_matches_set_replication(docs, raw):
    from sqlstreamstore_spark.analytics.text import contamination_matrix

    got = {(r.src_a, r.src_b): r for r in contamination_matrix(docs).collect()}
    per_src = defaultdict(set)
    for _id, text, _lang, src in raw:
        per_src[src] |= _shingle_set(text)
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(per_src[a] & per_src[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert (r.n_a, r.n_b, r.n_inter) == (len(per_src[a]), len(per_src[b]), inter)
            assert r.jaccard == inter / len(per_src[a] | per_src[b])
            assert r.contain_a_in_b == inter / len(per_src[a])


def test_stupid_backoff_matches_replication(docs, raw):
    from sqlstreamstore_spark.analytics.text import stupid_backoff_scores

    got = {r.doc_id: r for r in stupid_backoff_scores(docs).collect()}
    c3, c2, c1, n_train = Counter(), Counter(), Counter(), 0
    for doc_id, text, _lang, _src in raw:
        w = text.split(" ")
        if doc_id % 5 == 0:
            continue
        n_train += len(w)
        c1.update(w)
        c2.update(zip(w, w[1:]))
        c3.update(zip(w, w[1:], w[2:]))
    V = len(c1)
    a = 0.4
    for doc_id, text, _lang, _src in raw:
        if doc_id % 5 != 0:
            continue
        w = text.split(" ")
        tris = list(zip(w, w[1:], w[2:]))
        if not tris:
            assert doc_id not in got
            continue
        t1 = t2 = t3 = 0
        # fold in the operator's sorted order: sort contributions by
        # the integer struct so the float walk is identical
        items = Counter(tris)
        structs = []
        for (w1, w2, w3), m in items.items():
            k123, k23 = c3[(w1, w2, w3)], c2[(w2, w3)]
            structs.append((k123, c2[(w1, w2)], k23, c1[w2], c1[w3], m))
        s = 0.0
        for k123, k12, k23, kw2, kw3, m in sorted(structs):
            if k123 > 0:
                t1 += m
                v = math.log(k123) - math.log(k12)
            elif k23 > 0:
                t2 += m
                v = math.log(a) + math.log(k23) - math.log(kw2)
            else:
                t3 += m
                v = 2.0 * math.log(a) + math.log(kw3 + 1.0) - math.log(n_train + V)
            s += m * v
        r = got[doc_id]
        assert (r.n_trigrams, r.n_tier1, r.n_tier2, r.n_tier3) == (
            len(tris),
            t1,
            t2,
            t3,
        )
        assert abs(r.avg_logscore - s / len(tris)) < 1e-6


def test_kmv_jaccard_pairs_match_replication(docs, raw):
    from sqlstreamstore_spark.analytics.text import kmv_jaccard_pairs

    k = 32
    got = {(r.src_a, r.src_b): r for r in kmv_jaccard_pairs(docs).collect()}
    per_src = defaultdict(set)
    for _id, text, _lang, src in raw:
        per_src[src] |= {
            hashlib.md5(g.encode()).hexdigest() for g in _shingle_set(text)
        }
    srcs = sorted(per_src)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            A = sorted(per_src[sa])[:k]
            B = sorted(per_src[sb])[:k]
            union = sorted(set(A) | set(B))
            tau = union[k - 1] if len(union) >= k else union[-1]
            common = len([h for h in set(A) & set(B) if h <= tau])
            denom = k if len(union) >= k else len(union)
            j_est = common / denom
            inter = len(per_src[sa] & per_src[sb])
            j_exact = inter / len(per_src[sa] | per_src[sb])
            r = got[(sa, sb)]
            assert r.n_common_le_tau == common
            assert r.j_est == j_est
            assert r.j_exact == j_exact
            assert r.err == j_est - j_exact

    # sketch estimates track the exact values: mean |err| well under
    # the k=32 binomial noise floor
    errs = [abs(r.err) for r in got.values()]
    assert sum(errs) / len(errs) < 0.1


# ---------------------------------------------------------------- batch 2


@pytest.fixture(scope="module")
def tpch(spark):
    li = load_table(spark, SF, "lineitem").cache()
    pt = load_table(spark, SF, "part").cache()
    od = load_table(spark, SF, "orders").cache()
    li.count(), pt.count(), od.count()
    return li, pt, od


def test_assoc_rules_match_replication(tpch):
    from sqlstreamstore_spark.analytics.relational import brand_assoc_rules

    li, pt, _ = tpch
    got = {(r.antecedent, r.consequent): r for r in brand_assoc_rules(li, pt).collect()}
    brand = {r.p_partkey: r.p_brand for r in pt.collect()}
    baskets = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets[r.l_orderkey].add(brand[r.l_partkey])
    n = len(baskets)
    c_item, c_pair = Counter(), Counter()
    for items in baskets.values():
        c_item.update(items)
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                c_pair[(x, y)] += 1
    for (x, y), cb in c_pair.items():
        for a, c in ((x, y), (y, x)):
            r = got[(a, c)]
            assert (r.c_both, r.c_ante, r.c_cons, r.n_baskets) == (
                cb,
                c_item[a],
                c_item[c],
                n,
            )
            assert r.support == cb / n
            assert r.confidence == cb / c_item[a]
            assert r.lift == (cb * n) / (c_item[a] * c_item[c])
    assert len(got) == 2 * len(c_pair)


def test_backlog_sweepline_matches_interval_replication(tpch):
    from sqlstreamstore_spark.analytics.relational import open_lineitem_backlog

    li, _, od = tpch
    rows = open_lineitem_backlog(od, li).collect()
    odate = {r.o_orderkey: r.o_orderdate.date() for r in od.collect()}
    intervals = [
        (odate[r.l_orderkey], r.l_shipdate.date())
        for r in li.select("l_orderkey", "l_shipdate").collect()
        if r.l_shipdate.date() > odate[r.l_orderkey]  # operator's guard
    ]
    # literal interval-stabbing check on 25 sampled days: the backlog
    # at day d equals the number of intervals with open <= d < ship
    sampled = rows[:: max(1, len(rows) // 25)]
    for r in sampled:
        d = r.day.date()
        expect = sum(1 for o, s in intervals if o <= d < s)
        assert r.open_backlog == expect, (d, r.open_backlog, expect)
    # conservation: every open interval eventually closes
    assert rows[-1].open_backlog == 0
    assert sum(r.n_opened for r in rows) == sum(r.n_shipped for r in rows) == len(intervals)


def test_log_odds_enrichment_matches_numpy(docs, raw):
    from sqlstreamstore_spark.analytics.text import log_odds_enrichment

    got = {(r.lang, r.token): r for r in log_odds_enrichment(docs).collect()}
    y_iw, n_i, y_w = Counter(), Counter(), Counter()
    for _id, text, lang, _src in raw:
        for t in text.split(" "):
            y_iw[(lang, t)] += 1
            n_i[lang] += 1
            y_w[t] += 1
    n = sum(n_i.values())
    V = len(y_w)
    a = 0.5
    assert set(got) == set(y_iw)
    for (lang, t), y in y_iw.items():
        rest = y_w[t] - y
        delta = math.log((y + a) / (n_i[lang] + a * V - y - a)) - math.log(
            (rest + a) / (n - n_i[lang] + a * V - rest - a)
        )
        z = delta / math.sqrt(1.0 / (y + a) + 1.0 / (rest + a))
        r = got[(lang, t)]
        assert (r.y_iw, r.y_rest) == (y, rest)
        assert abs(r.log_odds - delta) < 1e-5
        assert abs(r.z - z) < 1e-5


# ---------------------------------------------------------------- batch 3


@pytest.fixture(scope="module")
def ev(spark):
    df = load_table(spark, SF, "events").cache()
    df.count()
    return df


def test_user_lifecycle_matches_replication_and_conserves(ev):
    import datetime

    from sqlstreamstore_spark.analytics.events import user_lifecycle

    rows = user_lifecycle(ev).collect()
    # replicate growth accounting literally
    pres = defaultdict(set)  # user -> set of week dates
    for r in ev.select("user_id", "ts").collect():
        if r.user_id is None or r.ts is None:
            continue
        d = r.ts.date()
        week = d - datetime.timedelta(days=d.weekday())
        pres[r.user_id].add(week)
    counts = defaultdict(lambda: [0, 0, 0, 0])  # week -> new/ret/res/churn
    max_week = max(w for ws in pres.values() for w in ws)
    for _u, ws in pres.items():
        seq = sorted(ws)
        for i, w in enumerate(seq):
            if i == 0:
                counts[w][0] += 1
            elif seq[i - 1] + datetime.timedelta(days=7) == w:
                counts[w][1] += 1
            else:
                counts[w][2] += 1
            nxt = seq[i + 1] if i + 1 < len(seq) else None
            churn_w = w + datetime.timedelta(days=7)
            if (nxt is None or nxt > churn_w) and churn_w <= max_week:
                counts[churn_w][3] += 1
    got = {r.week.date(): (r.n_new, r.n_retained, r.n_resurrected, r.n_churned) for r in rows}
    assert got == {w: tuple(v) for w, v in counts.items()}
    # conservation: churned(w) = active(w-1) - retained(w) for interior weeks
    active = {w: v[0] + v[1] + v[2] for w, v in counts.items()}
    for w, v in counts.items():
        prev = w - datetime.timedelta(days=7)
        if prev in active:
            assert v[3] == active[prev] - v[1], (w, v)


def test_functional_deps_match_numpy(docs, raw):
    from sqlstreamstore_spark.analytics.quality import functional_deps

    nchars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    tuples = [
        {
            "lang": lang,
            "source": src,
            "len_bucket": str(nchars[i] - nchars[i] % 100),
        }
        for i, _t, lang, src in raw
    ]
    n = len(tuples)

    def H(cols):
        c = Counter(tuple(t[c] for c in cols) for t in tuples)
        return math.log(n) - sum(v * math.log(v) for v in c.values()) / n

    got = {(r.x_col, r.y_col): r for r in functional_deps(docs).collect()}
    assert len(got) == 6
    for (x, y), r in got.items():
        hyx = H([x, y]) - H([x])
        hy = H([y])
        assert abs(r.h_y_given_x - hyx) < 1e-5
        assert abs(r.h_y - hy) < 1e-5
        assert abs(r.fd_strength - (1 - hyx / hy if hy > 0 else 1.0)) < 1e-5
        assert -1e-9 <= r.h_y_given_x  # conditional entropy is non-negative


def test_zipf_fit_matches_numpy(docs, raw):
    import numpy as np

    from sqlstreamstore_spark.analytics.text import zipf_fit

    got = zipf_fit(docs).collect()[0]
    c = Counter()
    for _i, text, _l, _s in raw:
        c.update(text.split(" "))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    ys = np.log(np.array([v for _, v in ranked], dtype=float))
    slope, intercept = np.polyfit(xs, ys, 1)
    r2 = np.corrcoef(xs, ys)[0, 1] ** 2
    assert got.vocab == len(ranked)
    assert abs(got.slope - slope) < 1e-5
    assert abs(got.intercept - intercept) < 1e-5
    assert abs(got.r2 - r2) < 1e-5
    assert got.slope < 0  # frequencies decay with rank


# ---------------------------------------------------------------- batch 4


def test_power_users_gini_matches_replication(ev):
    from sqlstreamstore_spark.analytics.events import power_users_gini

    got = power_users_gini(ev).collect()[0]
    c = Counter(
        r.user_id for r in ev.select("user_id").collect() if r.user_id is not None
    )
    xs = sorted(c.values())
    n = len(xs)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (
        n + 1
    ) / n
    assert (got.n_users, got.total_events) == (n, sum(xs))
    assert abs(got.gini - gini) < 1e-12
    assert 0.0 <= got.gini < 1.0


def test_token_burstiness_matches_replication(docs, raw):
    from sqlstreamstore_spark.analytics.text import token_burstiness

    got = {r.token: r for r in token_burstiness(docs).collect()}
    per = defaultdict(Counter)  # token -> doc -> count
    for i, text, _l, _s in raw:
        for t in text.split(" "):
            per[t][i] += 1
    N = len(raw)
    assert set(got) == set(per)
    for t, dc in per.items():
        total = sum(dc.values())
        ssq = sum(v * v for v in dc.values())
        mean = total / N
        var = ssq / N - mean * mean
        r = got[t]
        assert (r.total, r.df) == (total, len(dc))
        assert abs(r.fano - var / mean) < 1e-9
    # content tokens recur within their documents: some fano > 1
    assert max(r.fano for r in got.values()) > 1.0


def test_pareto_abc_matches_replication(tpch):
    from sqlstreamstore_spark.analytics.relational import pareto_abc_classes

    li, _, _ = tpch
    rows = {r.abc_class: r for r in pareto_abc_classes(li).collect()}
    rev = Counter()
    for r in li.select("l_partkey", "l_extendedprice", "l_discount").collect():
        cents = round(float(r.l_extendedprice) * 100)
        disc = round(float(r.l_discount) * 100)
        rev[r.l_partkey] += cents * (100 - disc)
    total = sum(rev.values())
    cum, classes = 0, Counter()
    class_rev = Counter()
    for k, v in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += v
        cl = "A" if cum * 5 <= total * 4 else ("B" if cum * 20 <= total * 19 else "C")
        classes[cl] += 1
        class_rev[cl] += v
    for cl in classes:
        assert (rows[cl].n_parts, rows[cl].class_rev) == (classes[cl], class_rev[cl])
        assert rows[cl].rev_share == class_rev[cl] / total
    assert sum(r.class_rev for r in rows.values()) == total


def test_ess_report_matches_replication(docs, raw):
    from sqlstreamstore_spark.analytics.sampling import ess_report

    got = ess_report(docs).collect()[0]
    ws = [len(t.split(" ")) for _i, t, _l, _s in raw]
    sw, sw2 = sum(ws), sum(w * w for w in ws)
    assert (got.n_docs, got.sum_w) == (len(ws), sw)
    assert got.ess == (sw * sw) / sw2
    assert got.ess_ratio == (sw * sw) / (sw2 * len(ws))
    assert got.ess <= got.n_docs  # Kish ESS never exceeds n


# ---------------------------------------------------------------- batch 5


def test_sla_percentiles_match_replication(tpch):
    from sqlstreamstore_spark.analytics.relational import sla_percentiles

    li, _, od = tpch
    got = {r.o_orderpriority: r for r in sla_percentiles(od, li).collect()}
    odate = {r.o_orderkey: (r.o_orderdate.date(), r.o_orderpriority) for r in od.collect()}
    per = defaultdict(list)
    for r in li.select("l_orderkey", "l_shipdate").collect():
        d0, prio = odate[r.l_orderkey]
        per[prio].append((r.l_shipdate.date() - d0).days)
    for prio, lats in per.items():
        lats.sort()
        n = len(lats)
        r = got[prio]
        assert r.n == n and r.min_days == lats[0] and r.max_days == lats[-1]
        for q, col in ((0.5, r.p50_days), (0.9, r.p90_days), (0.99, r.p99_days)):
            assert col == lats[math.ceil(q * n) - 1], (prio, q)


def test_inter_arrival_burstiness_matches_numpy(ev):
    import numpy as np

    from sqlstreamstore_spark.analytics.events import inter_arrival_burstiness

    got = {r.event_type: r for r in inter_arrival_burstiness(ev).collect()}
    per = defaultdict(list)
    for r in sorted(
        ev.select("event_type", "ts", "event_id").collect(),
        key=lambda r: (r.ts, r.event_id),
    ):
        if r.ts is not None:
            per[r.event_type].append(r.ts)
    for t, tss in per.items():
        gaps = np.array(
            [(b - a).total_seconds() * 1e6 for a, b in zip(tss, tss[1:])]
        )
        mu, sig = gaps.mean(), gaps.std()  # population std
        r = got[t]
        assert r.n == len(gaps)
        assert abs(r.mean_gap_us - mu) < 1e-3
        assert abs(r.std_gap_us - sig) < max(1e-3, sig * 1e-9)
        assert abs(r.burstiness - (sig - mu) / (sig + mu)) < 1e-9
        assert -1.0 < r.burstiness < 1.0
