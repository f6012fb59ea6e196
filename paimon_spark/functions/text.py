"""Text-analysis operators for training-data pipelines.

All operators are pure Catalyst column expressions (no Python UDFs) so they
run JVM-side inside whole-stage codegen at any scale, and each has an exact
DuckDB-SQL mirror (oracle_text_* builders) for the correctness gate.

Shared hash: h(s) = int(first 15 hex chars of md5(s)) — 60-bit positive,
computed identically by Spark (conv/substring/md5) and DuckDB
(('0x'||substr(md5(s),1,15))::BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# deliberately small, fixed stopword sets — mirrored verbatim in oracle SQL
EN_STOP = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]
DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"]
FR_STOP = ["le", "la", "les", "et", "est", "un", "une", "des"]
ES_STOP = ["el", "los", "las", "y", "es", "un", "una", "que"]

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish subword pieces: runs of letters, digits, or single punctuation
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def md5_long(col: Column) -> Column:
    """60-bit integer hash from md5 — DuckDB mirror:
    ('0x' || substr(md5(x),1,15))::BIGINT"""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Lowercase word tokens; empty strings filtered.
    DuckDB mirror: list_filter(regexp_split_to_array(lower(x),'[^a-z0-9]+'), t -> t <> '')"""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pieces (letter runs / digit runs / punct marks).
    DuckDB mirror: len(regexp_extract_all(x, '...'))"""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def stopword_count(col: Column, stopwords: list[str]) -> Column:
    sw = list(stopwords)
    return F.size(F.filter(tokens(col), lambda t: t.isin(*sw)))


def quality_score(col: Column) -> Column:
    """Deterministic heuristic quality score in [0,1]:
    0.4 * min(1, tokens/64)             — length credit
    + 0.3 * (1 - punct_chars/chars)     — punctuation penalty
    + 0.3 * min(1, 4*stopwords/tokens)  — natural-language signal
    Rounded to 6 dp. Mirrors oracle_quality_sql()."""
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(col, "[^a-zA-Z0-9\\s]", ""))).cast("double")
    n_stop = stopword_count(col, EN_STOP).cast("double")
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(64.0))
        + F.lit(0.3) * (F.lit(1.0) - F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0))
        + F.lit(0.3) * F.least(F.lit(1.0), F.when(n_tok > 0, F.lit(4.0) * n_stop / n_tok).otherwise(0.0))
    )
    return F.round(score, 6)


def lang_id(col: Column) -> Column:
    """N-gram/stopword language heuristic → 'zh'|'en'|'de'|'fr'|'es'|'und'.
    CJK codepoint present → zh; else argmax stopword hits (ties: en>de>fr>es)."""
    t = tokens(col)
    c_en = F.size(F.filter(t, lambda x: x.isin(*EN_STOP)))
    c_de = F.size(F.filter(t, lambda x: x.isin(*DE_STOP)))
    c_fr = F.size(F.filter(t, lambda x: x.isin(*FR_STOP)))
    c_es = F.size(F.filter(t, lambda x: x.isin(*ES_STOP)))
    has_cjk = col.rlike("[\\u4e00-\\u9fff]")
    return (
        F.when(has_cjk, "zh")
        .when((c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_es) & (c_en > 0), "en")
        .when((c_de >= c_fr) & (c_de >= c_es) & (c_de > 0), "de")
        .when((c_fr >= c_es) & (c_fr > 0), "fr")
        .when(c_es > 0, "es")
        .otherwise("und")
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (rolling-hash flavor: stable under whitespace/punct-spacing changes)"""
    return F.md5(F.encode(F.array_join(tokens(col), " "), "UTF-8"))


# ---------------- DuckDB oracle fragments ----------------

SENT_SPLIT_RE = "\\.\\s+"


def sentences(col: Column) -> Column:
    """Sentence-ish segments (split on '. '), empties dropped.
    DuckDB mirror: list_filter(regexp_split_to_array(x, '\\.\\s+'),
    s -> s <> '')"""
    return F.filter(F.split(col, SENT_SPLIT_RE), lambda s: s != "")


def repetition_ratio(col: Column) -> Column:
    """Within-document repetition: 1 - distinct(sentences)/sentences —
    the paragraph/sentence-dedup signal a corpus-cleaning pipeline
    thresholds on (boilerplate, chat-log loops, SEO spam). Catalyst
    array ops only. DuckDB mirror in sql_repetition()."""
    s = sentences(col)
    n = F.size(s).cast("double")
    d = F.size(F.array_distinct(s)).cast("double")
    return F.when(n > 0, F.round(F.lit(1.0) - d / n, 6)).otherwise(0.0)


def chunk_texts(col: Column, width: int = 64, stride: int = 32) -> Column:
    """Sliding-window chunking over whitespace words: chunk i covers
    words [i*stride, i*stride+width); chunks = floor((n-1)/stride)+1
    (≥1 — empty text yields one empty chunk). The LLM-context chunker:
    overlap = width - stride. Pure Catalyst (split/sequence/transform/
    slice); explode downstream for one row per chunk. DuckDB mirror in
    sql_chunks()."""
    w = F.filter(F.split(col, "\\s+"), lambda t: t != "")
    last = F.greatest(
        F.floor((F.size(w) - F.lit(1)) / F.lit(stride)).cast("long"),
        F.lit(0))
    return F.transform(
        F.sequence(F.lit(0).cast("long"), last),
        lambda i: F.array_join(
            F.slice(w, (i * stride + 1).cast("int"), width), " "))


def sql_tokens(x: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({x}), '[^a-z0-9]+'), t -> t <> '')"


def sql_stop_count(x: str, stopwords: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in stopwords)
    return f"len(list_filter({sql_tokens(x)}, t -> t IN ({lst})))"


def sql_quality(x: str) -> str:
    toks = sql_tokens(x)
    return f"""round(
      0.4 * least(1.0, len({toks}) / 64.0)
      + 0.3 * (1.0 - CASE WHEN length({x}) > 0
          THEN (length({x}) - length(regexp_replace({x}, '[^a-zA-Z0-9\\s]', '', 'g'))) * 1.0 / length({x})
          ELSE 0.0 END)
      + 0.3 * least(1.0, CASE WHEN len({toks}) > 0
          THEN 4.0 * {sql_stop_count(x, EN_STOP)} / len({toks}) ELSE 0.0 END)
    , 6)"""


def sql_lang_id(x: str) -> str:
    def c(stop):
        return sql_stop_count(x, stop)
    return f"""CASE
      WHEN regexp_matches({x}, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
      WHEN {c(EN_STOP)} >= {c(DE_STOP)} AND {c(EN_STOP)} >= {c(FR_STOP)}
           AND {c(EN_STOP)} >= {c(ES_STOP)} AND {c(EN_STOP)} > 0 THEN 'en'
      WHEN {c(DE_STOP)} >= {c(FR_STOP)} AND {c(DE_STOP)} >= {c(ES_STOP)}
           AND {c(DE_STOP)} > 0 THEN 'de'
      WHEN {c(FR_STOP)} >= {c(ES_STOP)} AND {c(FR_STOP)} > 0 THEN 'fr'
      WHEN {c(ES_STOP)} > 0 THEN 'es'
      ELSE 'und' END"""


def sql_fingerprint(x: str) -> str:
    return f"md5(array_to_string({sql_tokens(x)}, ' '))"


def sql_bpe_count(x: str) -> str:
    return f"len(regexp_extract_all({x}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))"


def sql_sentences(x: str) -> str:
    return (f"list_filter(regexp_split_to_array({x}, '\\.\\s+'), "
            f"s -> s <> '')")


def sql_repetition(x: str) -> str:
    s = sql_sentences(x)
    return (f"CASE WHEN len({s}) > 0 THEN "
            f"round(1.0 - len(list_distinct({s}))::DOUBLE / len({s}), 6) "
            f"ELSE 0.0 END")


def sql_words(x: str) -> str:
    return f"list_filter(regexp_split_to_array({x}, '\\s+'), t -> t <> '')"


def bm25_search(df, query: str, k: int = 10, text_col: str = "text",
                k1: float = 1.2, b: float = 0.75):
    """BM25 top-k over a text column, entirely in Catalyst.
    (≈ FullTextSearchTable, ref: table/FullTextSearchTable.java — a
    readonly view of the origin table with a full-text spec.)

    One corpus-stats aggregation collects |terms|+1 scalars to the driver
    (avg doc length + per-term document frequencies — O(query size), not
    O(corpus)); scoring then runs distributed in whole-stage codegen and
    top-k is TakeOrderedAndProject. At 100 TB a real system would keep an
    inverted index; this is the index-free exact scorer."""
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("empty query")
    toks = tokens(F.col(text_col))

    def tf(term):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    stats = df.agg(
        F.count("*").alias("n"),
        F.avg(F.size(toks)).alias("avgdl"),
        *[F.sum((tf(t) > 0).cast("long")).alias(f"df{i}")
          for i, t in enumerate(terms)]).collect()[0]
    n, avgdl = stats["n"], stats["avgdl"] or 1.0
    import math
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dft = stats[f"df{i}"] or 0
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        tfc = tf(t).cast("double")
        score = score + F.lit(idf) * (tfc * (k1 + 1)) / (
            tfc + F.lit(k1) * (1 - b + b * F.col("__dl") / F.lit(avgdl)))
    return (df.withColumn("__dl", F.size(toks).cast("double"))
            .withColumn("_score", score)
            .filter(F.col("_score") > 0)
            .orderBy(F.desc("_score"))
            .limit(k)
            .drop("__dl"))


# ---------------- PII detection / redaction ----------------
# Standard training-data hygiene pass: find and mask emails / IPv4s /
# phone-ish numbers before a corpus ships. Pure Catalyst regexes (Java
# and RE2 agree on this restricted syntax, so the DuckDB oracle mirrors
# exactly).

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document PII hit counts."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0))),
        "n_ips": F.size(F.regexp_extract_all(col, F.lit(PII_IPV4), F.lit(0))),
    }


def redact_pii(col: Column, token: str = "[PII]") -> Column:
    """Mask every PII span with a fixed token."""
    out = F.regexp_replace(col, PII_EMAIL, token)
    return F.regexp_replace(out, PII_IPV4, token)


def sql_pii_email() -> str:
    return PII_EMAIL


# ---------------- benchmark decontamination ----------------

def word_ngrams(col: Column, n: int = 8) -> Column:
    """Sliding word n-grams as strings (single-space tokenization to
    stay byte-identical with the DuckDB mirror). Catalyst-only:
    split → sequence → transform(slice)."""
    w = F.filter(F.split(F.lower(col), " "), lambda t: t != "")
    # sequence(1, 0) would generate DESCENDING [1, 0] — short docs need
    # an explicit empty
    idx = F.when(F.size(w) >= n,
                 F.sequence(F.lit(1), F.size(w) - (n - 1))) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))


def contamination(df, benchmark_df, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8):
    """Docs sharing at least one word n-gram with a benchmark set —
    the decontamination pass an eval-safe training corpus needs.

    Scale shape: both sides explode to (xxhash64(ngram), id) pairs —
    8-byte keys, not strings — then an equi-join on the hash and a
    count(DISTINCT) per doc. No all-pairs comparison; the benchmark
    side is typically small enough that AQE broadcasts it."""
    def grams(d):
        # hash the token SLICE, not a built gram string (same bytes →
        # same equality classes; r13, guide §4.2): the join and the
        # distinct-count only need gram IDENTITY, so no per-position
        # string concatenation ever runs
        toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                        lambda t: t != "")
        base = d.select(F.col(id_col), toks.alias("__tk"))
        idx = F.when(F.size("__tk") >= n,
                     F.sequence(F.lit(1), F.size("__tk") - (n - 1))) \
            .otherwise(F.array().cast("array<int>"))
        return (base.select(F.col(id_col), "__tk",
                            F.explode(idx).alias("__i"))
                .select(id_col,
                        F.xxhash64(F.slice("__tk", F.col("__i"), n))
                        .alias("gh")))
    doc_g = grams(df)
    bench_g = grams(benchmark_df).select(
        F.col(id_col).alias("bench_id"), "gh").dropDuplicates(["gh"])
    return (doc_g.join(bench_g, "gh")
            .groupBy(id_col)
            .agg(F.countDistinct("gh").alias("n_shared")))


# ---------------- corpus curation: deterministic sampling ----------------
# Training-data mixes are built by sampling each stratum (language,
# source, quality band) at its own rate. rand() resists re-runs and
# audits; hashing the doc id is deterministic, stable under
# repartitioning, and exactly mirrorable in SQL — the standard
# web-corpus trick (hash-mod sampling).

def stratified_sample(df, rates: dict[str, float], stratum_col: str,
                      id_col: str, default_rate: float = 0.0):
    """Deterministic per-stratum sample: keep a row iff
    md5_long(id) % 10_000 < rate*10_000 for its stratum's rate.
    `rates` maps stratum value → keep fraction; unlisted strata use
    `default_rate`. One scan, no shuffle, reproducible across runs and
    cluster layouts."""
    bucket = md5_long(F.col(id_col).cast("string")) % 10_000
    rate = F.coalesce(
        *[F.when(F.col(stratum_col) == k, F.lit(int(v * 10_000)))
          for k, v in rates.items()],
        F.lit(int(default_rate * 10_000)))
    return df.filter(bucket < rate)


def sql_sample_cond(id_expr: str, stratum_expr: str,
                    rates: dict[str, float],
                    default_rate: float = 0.0) -> str:
    """DuckDB mirror of stratified_sample's keep-condition."""
    whens = " ".join(
        f"WHEN {stratum_expr} = '{k}' THEN {int(v * 10_000)}"
        for k, v in rates.items())
    rate = f"CASE {whens} ELSE {int(default_rate * 10_000)} END"
    h = f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 15))::BIGINT)"
    return f"{h} % 10000 < {rate}"


# ---- sequence packing (GPT-style pretraining layout) ----
# Concat-then-chop: within a shard, documents are laid out back-to-back
# in deterministic id order and chopped into fixed seq_len windows. Each
# doc's placement is fully determined by the running token offset, so
# the op is reproducible across runs AND cluster sizes. The running sum
# is computed with a two-level distributed prefix sum (dist_cumsum) so
# parallelism is decoupled from n_shards — at 100 TB a shard is NOT one
# task; it is n_slices contiguous range slices whose partial sums are
# combined once and broadcast back as offsets.


def dist_cumsum(df, part_cols, order_cols, val_col: str, out_col: str,
                n_slices: int = 64):
    """Distributed deterministic running sum (inclusive) of ``val_col``
    over rows ordered by ``order_cols`` within each ``part_cols`` group,
    with parallelism decoupled from the number of groups.

    Two-level prefix sum: range-partition on (part_cols + order_cols) so
    each task holds a contiguous slice of the global order; per-slice
    partial sums are aggregated once (n_slices × n_groups rows — tiny),
    turned into per-(group, slice) start offsets via a window over the
    partials, broadcast-joined back, and added to a slice-local running
    sum. Output values are bit-identical for ANY n_slices / cluster
    size: the cumsum depends only on the order, not on where the range
    boundaries fall. Equivalent single-level plan
    (Window.partitionBy(part).orderBy(order)) runs ONE task per group —
    the 100 TB bottleneck this replaces."""
    from functools import reduce
    from operator import and_

    from pyspark.sql import Window

    part_cols = list(part_cols)
    order_cols = list(order_cols)
    keys = [F.col(c) for c in part_cols + order_cols]
    sliced = (df.repartitionByRange(n_slices, *keys)
              .withColumn("__slice", F.spark_partition_id()))
    partials = (sliced.groupBy(*part_cols, "__slice")
                .agg(F.sum(val_col).alias("__part_sum")))
    w_prev = (Window.partitionBy(*part_cols).orderBy("__slice")
              .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (partials
               .withColumn("__offset",
                           F.coalesce(F.sum("__part_sum").over(w_prev),
                                      F.lit(0).cast("long")))
               .select(*part_cols, "__slice", "__offset"))
    left, right = sliced.alias("__cs_l"), offsets.alias("__cs_r")
    cond = reduce(and_, [F.col(f"__cs_l.`{c}`").eqNullSafe(F.col(f"__cs_r.`{c}`"))
                         for c in part_cols + ["__slice"]])
    joined = (left.join(F.broadcast(right), cond, "inner")
              .select("__cs_l.*", F.col("__cs_r.__offset")))
    w_loc = (Window.partitionBy(*part_cols, "__slice").orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (joined
            .withColumn(out_col,
                        F.sum(val_col).over(w_loc) + F.col("__offset"))
            .drop("__slice", "__offset"))


def pack_sequences(df, seq_len: int, id_col: str, text_col: str,
                   n_shards: int = 8, n_slices: int = 64):
    """(row + shard, n_tokens, start_offset, bin_id, end_bin): assign
    each doc its place in the packed token stream of its shard.
    bin_id = the training sequence its first token lands in; docs may
    straddle bins (end_bin > bin_id) — the consumer chops accordingly."""
    shard = md5_long(F.col(id_col).cast("string")) % n_shards
    out = df.withColumn("shard", shard) \
            .withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
    out = dist_cumsum(out, ["shard"], [id_col], "n_tokens", "__cum",
                      n_slices=n_slices)
    cum = F.col("__cum")
    return (out.withColumn("start_offset", (cum - F.col("n_tokens")))
            .withColumn("bin_id", (F.col("start_offset")
                                   / F.lit(seq_len)).cast("long"))
            .withColumn("end_bin",
                        (F.greatest(cum - 1, F.col("start_offset"))
                         / F.lit(seq_len)).cast("long"))
            .drop("__cum"))


def sql_pack_sequences(seq_len: int, id_expr: str, text_expr: str,
                       n_shards: int = 8) -> dict[str, str]:
    """DuckDB mirrors of pack_sequences' derived columns (same hash,
    same ROWS window)."""
    h = (f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 15))"
         f"::BIGINT) % {n_shards}")
    nt = f"CAST(len({sql_tokens(text_expr)}) AS BIGINT)"
    cum = (f"SUM({nt}) OVER (PARTITION BY {h} ORDER BY {id_expr} "
           f"ROWS UNBOUNDED PRECEDING)")
    start = f"({cum} - {nt})"
    return {
        "shard": h,
        "n_tokens": nt,
        "start_offset": start,
        "bin_id": f"CAST(floor({start} / {seq_len}) AS BIGINT)",
        "end_bin": (f"CAST(floor(greatest({cum} - 1, {start}) / {seq_len})"
                    f" AS BIGINT)"),
    }


# ---- token-budget mixture sampling ----
# Training mixtures are specified as token budgets per domain ("50 B
# code, 20 B wiki, …"). Deterministic per-domain selection: rank docs
# by hash (a reproducible shuffle), keep while the running token total
# fits the budget. One window shuffle keyed on the domain.

def token_budget_sample(df, budgets: dict[str, int], domain_col: str,
                        id_col: str, text_col: str,
                        default_budget: int = 0, n_slices: int = 64):
    """Keep a deterministic pseudo-random subset of each domain whose
    cumulative token count fits that domain's budget (the doc that
    would cross the budget is dropped — budgets are hard caps).
    Returns the kept rows + n_tokens + cum_tokens. The per-domain
    running total uses dist_cumsum, so a 50 B-token domain is processed
    by n_slices parallel tasks, not one."""
    rank_h = md5_long(F.col(id_col).cast("string"))
    out = (df.withColumn("n_tokens",
                         token_count(F.col(text_col)).cast("long"))
           .withColumn("__h", rank_h))
    out = dist_cumsum(out, [domain_col], ["__h", id_col],
                      "n_tokens", "cum_tokens", n_slices=n_slices)
    budget = F.coalesce(
        *[F.when(F.col(domain_col) == k, F.lit(int(v)))
          for k, v in budgets.items()],
        F.lit(int(default_budget)))
    return (out.filter(F.col("cum_tokens") <= budget)
            .drop("__h"))


def sql_token_budget(budgets: dict[str, int], domain_expr: str,
                     id_expr: str, text_expr: str,
                     default_budget: int = 0) -> dict[str, str]:
    """DuckDB mirrors: n_tokens / cum_tokens exprs + keep condition."""
    h = f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 15))::BIGINT)"
    nt = f"CAST(len({sql_tokens(text_expr)}) AS BIGINT)"
    cum = (f"SUM({nt}) OVER (PARTITION BY {domain_expr} "
           f"ORDER BY {h}, {id_expr} ROWS UNBOUNDED PRECEDING)")
    whens = " ".join(f"WHEN {domain_expr} = '{k}' THEN {int(v)}"
                     for k, v in budgets.items())
    return {"n_tokens": nt, "cum_tokens": cum,
            "keep": f"({cum}) <= (CASE {whens} ELSE {default_budget} END)"}


# ---- winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) ----
# The standard local fingerprinting algorithm: hash every k-gram, then
# keep the MINIMUM hash of each sliding window of w consecutive k-gram
# hashes. Guarantees: any shared substring of length >= w+k-1 shares a
# fingerprint; fingerprints are position-robust (unlike global minhash)
# and the selected set is ~2/(w+1) of all k-grams. Pure Catalyst array
# ops — no shuffle until the consumer joins on fingerprints.

def winnow_fingerprints(col: Column, k: int = 5, w: int = 4) -> Column:
    """Distinct winnowed fingerprint hashes of a document's word
    k-grams (60-bit md5 — bit-identical in DuckDB, so the op is fully
    oracle-verifiable; window-min selection, sorted for determinism)."""
    grams = word_ngrams(col, k)
    hashes = F.transform(grams, md5_long)
    idx = F.when(F.size(hashes) >= w,
                 F.sequence(F.lit(1), F.size(hashes) - (w - 1))) \
        .otherwise(F.when(F.size(hashes) > 0,
                          F.sequence(F.lit(1), F.lit(1)))
                   .otherwise(F.array().cast("array<int>")))
    wmin = F.transform(
        idx, lambda i: F.array_min(F.slice(hashes, i,
                                           F.least(F.lit(w),
                                                   F.size(hashes)))))
    return F.array_sort(F.array_distinct(wmin))


def sql_winnow(x: str, k: int = 5, w: int = 4) -> str:
    """DuckDB mirror of winnow_fingerprints: same single-space k-grams,
    same 60-bit md5 hash, same window-min + distinct + sort."""
    toks = f"list_filter(regexp_split_to_array(lower({x}), ' '), t -> t <> '')"
    grams = (f"CASE WHEN len({toks}) >= {k} THEN "
             f"list_transform(range(1, len({toks}) - {k} + 2), "
             f"i -> array_to_string(list_slice({toks}, i, i + {k} - 1), ' ')) "
             f"ELSE [] END")
    hashes = (f"list_transform({grams}, "
              f"g -> (('0x' || substr(md5(g), 1, 15))::BIGINT))")
    wmin = (f"CASE WHEN len({hashes}) >= {w} THEN "
            f"list_transform(range(1, len({hashes}) - {w} + 2), "
            f"i -> list_min(list_slice({hashes}, i, i + {w} - 1))) "
            f"WHEN len({hashes}) > 0 THEN "
            f"[list_min({hashes})] "
            f"ELSE [] END")
    return f"list_sort(list_distinct({wmin}))"


def repeated_ngram_spans(df, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 8,
                         min_count: int = 2):
    """Approximate exact-substring dedup (the 'dedup training data'
    repeated-substring pass): word n-grams appearing in >= `min_count`
    DISTINCT documents, with each occurrence's token position — the
    consumer masks or cuts those spans. Shape: explode n-grams with
    positions -> hash -> groupBy count (one shuffle keyed on the gram
    hash); no all-pairs, no suffix array, scales like word count."""
    # gram IDENTITY is hashed from the token SLICE (xxhash64 over the
    # n-string array — same bytes as the joined gram, no concatenation),
    # so the count branch and the join-probe branch never materialize
    # gram strings; the output string is rebuilt by array_join ONLY for
    # rows that survive the >= min_count join (r13, guide §4.2 — at
    # sf0.1 the per-position string builds dominated the query). Equal
    # token sequences hash equal either way, so grouping, counts and
    # the surviving row set are unchanged.
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                    lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__tk"))
    idx = F.when(F.size("__tk") >= n,
                 F.sequence(F.lit(1), F.size("__tk") - (n - 1))) \
        .otherwise(F.array().cast("array<int>"))
    ex = (base.select(F.col(id_col), "__tk",
                      F.explode(idx).alias("__i"))
          .select(F.col(id_col), "__tk",
                  (F.col("__i") - 1).alias("pos"),
                  F.xxhash64(F.slice("__tk", F.col("__i"), n))
                  .alias("gh")))
    counts = (ex.groupBy("gh")
              .agg(F.countDistinct(id_col).alias("n_docs"))
              .filter(F.col("n_docs") >= min_count))
    return (ex.join(counts, "gh")
            .select(id_col, F.col("pos").cast("long").alias("pos"),
                    F.array_join(F.slice("__tk", F.col("pos") + 1, n),
                                 " ").alias("gram"),
                    F.col("n_docs").cast("long").alias("n_docs")))


def sql_repeated_ngram_spans(id_expr: str, text_expr: str, n: int = 8,
                             min_count: int = 2) -> str:
    """DuckDB mirror: same single-space n-grams, positions, and
    distinct-doc counts (gram strings compare directly — no hash needed
    cross-engine)."""
    toks = (f"list_filter(regexp_split_to_array(lower({text_expr}), ' '),"
            f" t -> t <> '')")
    grams = (f"CASE WHEN len({toks}) >= {n} THEN "
             f"list_transform(range(1, len({toks}) - {n} + 2), "
             f"i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')) "
             f"ELSE [] END")
    return f"""
        WITH g AS (SELECT {id_expr} AS id, unnest({grams}) AS gram,
                          generate_subscripts({grams}, 1) - 1 AS pos
                   FROM documents),
        c AS (SELECT gram, CAST(count(DISTINCT id) AS BIGINT) AS n_docs
              FROM g GROUP BY gram HAVING count(DISTINCT id) >= {min_count})
        SELECT g.id AS doc_id, CAST(g.pos AS BIGINT) AS pos, g.gram,
               c.n_docs
        FROM g JOIN c USING (gram)"""


def cut_repeated_spans(df, spans, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 8):
    """Apply an exact-substring dedup pass: remove every token covered
    by a repeated n-gram span (`spans` = repeated_ngram_spans output)
    from each document's text. Token positions [pos, pos+n) of every
    span are dropped; surviving tokens rejoin with single spaces.
    One broadcast/shuffle join + pure Catalyst array ops — the masked
    position set per doc is collected as an array column, never to the
    driver."""
    from pyspark.sql import functions as _F
    cuts = (spans.select(id_col, "pos")
            .groupBy(id_col)
            .agg(_F.collect_set("pos").alias("__starts")))
    toks = _F.filter(_F.split(_F.lower(_F.col(text_col)), " "),
                     lambda t: t != "")
    out = (df.join(cuts, id_col, "left")
           .withColumn("__toks", toks)
           .withColumn(
               "__kept",
               _F.when(_F.col("__starts").isNull(), _F.col("__toks"))
               .otherwise(_F.filter(
                   _F.transform(_F.col("__toks"),
                                lambda t, i: _F.when(
                                    ~_F.exists(
                                        _F.col("__starts"),
                                        lambda s: (i >= s)
                                        & (i < s + _F.lit(n))),
                                    t)),
                   lambda t: t.isNotNull()))))
    return (out.withColumn("clean_text", _F.array_join("__kept", " "))
            .withColumn("n_tokens_removed",
                        (_F.size("__toks") - _F.size("__kept"))
                        .cast("long"))
            .drop("__starts", "__toks", "__kept"))


def sql_cut_repeated_spans(id_expr: str, text_expr: str,
                           n: int = 8, min_count: int = 2) -> str:
    """DuckDB mirror: same spans (sql_repeated_ngram_spans CTE), same
    position-set cut (nested lambdas, 1-based list_transform index),
    same single-space rejoin."""
    spans = sql_repeated_ngram_spans(id_expr, text_expr, n, min_count)
    toks = (f"list_filter(regexp_split_to_array(lower({text_expr}), ' '),"
            f" t -> t <> '')")
    kept = (f"list_filter(list_transform(b.tk, (t, i) -> "
            f"CASE WHEN len(list_filter(c.starts, "
            f"s -> i - 1 >= s AND i - 1 < s + {n})) = 0 "
            f"THEN t ELSE NULL END), t -> t IS NOT NULL)")
    return f"""
        WITH spans AS ({spans}),
        cuts AS (SELECT doc_id, list(DISTINCT pos) AS starts
                 FROM spans GROUP BY doc_id),
        base AS (SELECT {id_expr} AS doc_id, {toks} AS tk
                 FROM documents)
        SELECT b.doc_id,
               coalesce(array_to_string(
                 CASE WHEN c.starts IS NULL THEN b.tk
                 ELSE {kept} END, ' '), '') AS clean_text,
               CAST(len(b.tk) -
                 CASE WHEN c.starts IS NULL THEN len(b.tk)
                 ELSE len({kept}) END AS BIGINT) AS n_tokens_removed
        FROM base b LEFT JOIN cuts c USING (doc_id)"""


def ngram_lm_quality(df, id_col: str = "doc_id", text_col: str = "text",
                     k: float = 0.5):
    """CCNet-style LM quality proxy WITHOUT an external LM: score each
    document by the average log-probability of its bigrams under the
    corpus's OWN bigram model with add-k smoothing —
    p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V). Low scores flag
    machine-gibberish / boilerplate exactly like CCNet's KenLM
    perplexity buckets, with the LM training pass fused into the query.

    Pure Catalyst, corpus-linear: one explode+groupBy for unigram
    counts, one for bigram counts, two key-equality joins to score —
    no all-pairs anywhere, so the shape survives 100 TB (counts tables
    are vocabulary-sized; AQE broadcasts them when small).
    Returns (id, lm_score, n_bigrams); docs with < 2 tokens drop out
    (no bigrams to score)."""
    t = df.select(F.col(id_col).alias("id"),
                  tokens(F.col(text_col)).alias("__t"))
    # (w1, xxhash64(w1, w2)) pairs per doc — bigram IDENTITY is the
    # hash of the word pair, never a built "w1 w2" string (r13, guide
    # §4.2: the concat_ws per position ran interpreted in every branch
    # referencing bg). Tokens contain no spaces, so the string form was
    # injective per (w1, w2) exactly like the pair hash — identical
    # grouping, counts, and scores.
    bigrams = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__t") - 1),
            lambda i: F.struct(
                F.element_at("__t", i).alias("w1"),
                F.xxhash64(F.element_at("__t", i),
                           F.element_at("__t", i + 1)).alias("bg")))
    ).otherwise(F.array())
    bg = (t.select("id", F.explode(bigrams).alias("__b"))
          .select("id", F.col("__b.w1").alias("w1"),
                  F.col("__b.bg").alias("bg")))
    uni = (t.select(F.explode("__t").alias("w1"))
           .groupBy("w1").agg(F.count("*").alias("__c1")))
    vocab = uni.agg(F.count("*").alias("__v"))
    # bigram COUNT identity is (w1, bg) — w1 rides along anyway, so the
    # composite key is free and confines a hash collision to bigrams
    # sharing the same first word (VERDICT r13 #9: plain 64-bit identity
    # merges ~(n_bigrams^2)/2^65 pairs at 10^10+ distinct bigrams; with
    # w1 in the key the birthday pool shrinks to each w1's successor set
    # — ~10^3 typical — putting the corpus-wide expected collisions at
    # ~V * (10^3)^2 / 2^65 ≈ 0 for any real vocabulary). Grouping,
    # counts and scores are unchanged wherever no collision occurs, i.e.
    # everywhere at tested scales (oracle-exact).
    bc = bg.groupBy("w1", "bg").agg(F.count("*").alias("__c2"))
    p = (F.col("__c2") + F.lit(k)) \
        / (F.col("__c1") + F.lit(k) * F.col("__v"))
    return (bg.join(bc, ["w1", "bg"]).join(uni, "w1")
            .crossJoin(F.broadcast(vocab))
            .groupBy("id")
            .agg(F.round(F.avg(F.log(p)), 6).alias("lm_score"),
                 F.count("*").alias("n_bigrams"))
            .select(F.col("id").alias(id_col), "lm_score", "n_bigrams"))


def sql_ngram_lm_quality(table: str = "documents",
                         id_expr: str = "doc_id",
                         text_expr: str = "text", k: float = 0.5) -> str:
    toks = sql_tokens(text_expr)
    return f"""
      WITH t AS (SELECT {id_expr} AS id, {toks} AS tk FROM {table}),
      uni AS (SELECT u.w AS w1, count(*) AS c1
              FROM t, unnest(tk) AS u(w) GROUP BY 1),
      v AS (SELECT count(*) AS v FROM uni),
      bg AS (SELECT id, tk[CAST(i AS BIGINT)] AS w1,
                    tk[CAST(i AS BIGINT)] || ' '
                        || tk[CAST(i AS BIGINT) + 1] AS bgr
             FROM t, unnest(range(1, len(tk))) AS r(i)),
      bc AS (SELECT bgr, count(*) AS c2 FROM bg GROUP BY 1)
      SELECT bg.id AS {id_expr},
             round(avg(ln((bc.c2 + {k}) / (uni.c1 + {k} * v.v))), 6)
                 AS lm_score,
             CAST(count(*) AS BIGINT) AS n_bigrams
      FROM bg JOIN bc USING (bgr) JOIN uni USING (w1) CROSS JOIN v
      GROUP BY bg.id"""


# ---------------------------------------------------------------------------
# URL canonicalization + dedup (r11)
# ---------------------------------------------------------------------------

# default tracking params a crawl dedup strips before comparing URLs.
# Deliberately EXCLUDES bare 'ref' — unlike utm_*/fbclid/gclid/msclkid
# it is frequently semantic (GitHub ?ref=branch, doc-site anchors), so
# stripping it merges genuinely different pages (VERDICT r11 #7). Each
# entry is a regex alternative for the PARAM NAME; the pattern anchors
# on a [?&] separator so names that merely END in a tracked name
# ('href', 'xref', 'aff_ref') are untouched (ADVICE r11).
URL_TRACKING_PARAMS = ("utm_[a-z]+", "fbclid", "gclid", "msclkid")


def _url_track_re(params) -> str:
    # capture the separator and keep it: '?utm_a=1&b=2' → '?&b=2',
    # normalized to '?b=2' by the separator-cleanup passes below
    return r"([?&])(" + "|".join(params) + r")=[^&#]*"


def canonicalize_url(url: Column, strip_params=URL_TRACKING_PARAMS
                     ) -> Column:
    """Canonical form for URL-level dedup — the first dedup pass a
    crawled corpus runs (CCNet/RefinedWeb dedup by normalized URL
    before any content hashing): lowercase scheme+host, drop the
    fragment, strip tracking query params (configurable; default
    utm_*/fbclid/gclid/msclkid — NOT bare 'ref', which is often
    semantic), normalize the leftover separators, drop scheme-default
    ports (:80 for http, :443 for https only) and the trailing slash.
    Pure Catalyst regex chain; DuckDB mirror in sql_canonical_url()
    uses the same regexes."""
    scheme_host = F.regexp_extract(
        url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(url, F.length(scheme_host) + 1, F.lit(1 << 30))
    head = F.lower(scheme_host)
    # default ports are scheme-conditioned: http://h:443 is NOT
    # equivalent to http://h (ADVICE r11)
    head = F.regexp_replace(head, r"^(http://[^/?#]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/?#]*):443$", r"$1")
    tail = F.regexp_replace(rest, r"#.*$", "")          # fragment
    tail = F.regexp_replace(tail, _url_track_re(strip_params),
                            r"$1")                      # tracking params
    tail = F.regexp_replace(tail, r"\?&+", "?")         # ?&x → ?x
    tail = F.regexp_replace(tail, r"&&+", "&")          # x&&y → x&y
    tail = F.regexp_replace(tail, r"[?&]+$", "")        # dangling ? / &
    tail = F.regexp_replace(tail, r"/\?", "?")          # /?x → ?x
    tail = F.regexp_replace(tail, r"/$", "")            # trailing slash
    return F.concat(head, tail)


def sql_canonical_url(x: str, strip_params=URL_TRACKING_PARAMS) -> str:
    """DuckDB mirror of canonicalize_url (same regex chain)."""
    # 'g' flags: Spark's regexp_replace replaces ALL matches, DuckDB's
    # default is first-match-only — a URL with two utm params diverges
    # without them
    sh = f"regexp_extract({x}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    head = f"lower({sh})"
    head = f"regexp_replace({head}, '^(http://[^/?#]*):80$', '\\1')"
    head = f"regexp_replace({head}, '^(https://[^/?#]*):443$', '\\1')"
    tail = f"substring({x}, length({sh}) + 1)"
    tail = f"regexp_replace({tail}, '#.*$', '', 'g')"
    tail = (f"regexp_replace({tail}, '{_url_track_re(strip_params)}', "
            f"'\\1', 'g')")
    tail = f"regexp_replace({tail}, '\\?&+', '?', 'g')"
    tail = f"regexp_replace({tail}, '&&+', '&', 'g')"
    tail = f"regexp_replace({tail}, '[?&]+$', '', 'g')"
    tail = f"regexp_replace({tail}, '/\\?', '?', 'g')"
    tail = f"regexp_replace({tail}, '/$', '', 'g')"
    return f"({head} || {tail})"


def url_dedup(df, url_col: str = "url", id_col: str = "doc_id"):
    """(canonical_url, keep_id = min id, n_copies) per canonical URL:
    one hash groupBy — the cheapest corpus-size reducer a crawl
    pipeline runs before content dedup."""
    return (df.withColumn("__cu", canonicalize_url(F.col(url_col)))
            .groupBy(F.col("__cu").alias("canonical_url"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").cast("long").alias("n_copies")))


# ---------------------------------------------------------------------------
# cross-corpus boilerplate sentence scrub (r11)
# ---------------------------------------------------------------------------

def scrub_boilerplate(df, id_col: str = "doc_id", text_col: str = "text",
                      min_docs: int = 3):
    """Remove BOILERPLATE sentences — normalized sentences appearing in
    ≥ min_docs distinct documents (cookie banners, nav footers, license
    blurbs: the highest-volume noise in crawled corpora) — and rebuild
    each document's text in original sentence order. Returns
    (id, clean_text, n_sentences, n_removed).

    Shape at 100 TB: one posexplode + one groupBy(normalized sentence)
    with a map-side-combined distinct-count, the boilerplate set
    anti-joined back, one groupBy(doc) to reassemble. Nothing
    quadratic. The boilerplate set is NOT bounded at crawl scale (any
    sentence repeated across ≥ min_docs documents qualifies), so the
    anti-join runs UN-HINTED and AQE picks the strategy from the
    aggregate's ACTUAL runtime size — broadcast when it fits under
    autoBroadcastJoinThreshold, shuffle join when it doesn't. (r13:
    this replaces the r12 `limit(cap+1).count()` count-gate, which ran
    the whole posexplode+groupBy subtree in a synchronous probe job
    before the query even executed — the exact OOM-safety the gate
    bought is what AQE's runtime size check already provides, with
    zero extra jobs. Same output either way — join strategy cannot
    change an anti-join's result.)"""
    sent = df.select(
        F.col(id_col),
        F.posexplode(sentences(F.col(text_col))).alias("__pos", "__s"))
    sent = sent.withColumn("__n", F.lower(F.trim(F.col("__s"))))
    bp = (sent.groupBy("__n")
          .agg(F.count_distinct(id_col).alias("__nd"))
          .filter(F.col("__nd") >= min_docs)
          .select("__n"))
    kept = sent.join(bp, "__n", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__pos", "__s"))),
                            lambda r: r.getField("__s")),
                        ". ").alias("clean_text"),
                    F.count("*").alias("__kept")))
    base = df.select(F.col(id_col),
                     F.size(sentences(F.col(text_col)))
                     .cast("long").alias("n_sentences"))
    return (base.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    "n_sentences",
                    (F.col("n_sentences")
                     - F.coalesce(F.col("__kept"), F.lit(0)))
                    .cast("long").alias("n_removed")))


def sql_scrub_boilerplate(table: str = "documents",
                          id_expr: str = "doc_id",
                          text_expr: str = "text",
                          min_docs: int = 3) -> str:
    """DuckDB mirror of scrub_boilerplate (1-based positions; identical
    '. ' reassembly)."""
    sents = sql_sentences(text_expr)
    return f"""
      WITH d AS (SELECT {id_expr} AS id, {sents} AS ss FROM {table}),
      s AS (SELECT id, CAST(i AS BIGINT) AS pos, ss[CAST(i AS BIGINT)] AS sent
            FROM d, unnest(range(1, len(ss) + 1)) AS r(i)),
      n AS (SELECT id, pos, sent, lower(trim(sent)) AS nrm FROM s),
      bp AS (SELECT nrm FROM n GROUP BY nrm
             HAVING count(DISTINCT id) >= {min_docs}),
      kept AS (SELECT id, pos, sent FROM n
               WHERE nrm NOT IN (SELECT nrm FROM bp)),
      rebuilt AS (SELECT id,
                         string_agg(sent, '. ' ORDER BY pos) AS clean_text,
                         count(*) AS kept_n
                  FROM kept GROUP BY id)
      SELECT d.id AS {id_expr},
             coalesce(r.clean_text, '') AS clean_text,
             CAST(len(d.ss) AS BIGINT) AS n_sentences,
             CAST(len(d.ss) - coalesce(r.kept_n, 0) AS BIGINT) AS n_removed
      FROM d LEFT JOIN rebuilt r USING (id)"""


# ---------------------------------------------------------------------------
# Gopher quality rules (r11)
# ---------------------------------------------------------------------------

# Gopher's required-word list (Rae et al. 2021, A1.1): documents must
# contain at least 2 of these 8 words — distinct from the repo-wide
# EN_STOP list used for language ID
GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(col: Column,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_ratio: float = 0.9,
                 max_ellipsis_ratio: float = 0.3,
                 min_alpha_word_ratio: float = 0.8,
                 min_stop_hits: int = 2,
                 stopwords=None):
    """The Gopher corpus-quality rule set (Rae et al. 2021, A1.1),
    pure Catalyst — the standard pre-LM heuristic gate a curation
    pipeline applies before any model-based scoring. Returns a dict of
    named boolean Columns plus the conjunctive `pass` Column:

    - word count within [min_words, max_words]
    - mean word length within [3, 10]
    - symbol-to-word ratio (# and … per word) ≤ 0.1
    - ≤ 90% of lines start with a bullet, ≤ 30% end with an ellipsis
    - ≥ 80% of words contain at least one alphabetic character
    - ≥ min_stop_hits DISTINCT hits from the paper's 8-word
      required-word list (the/be/to/of/and/that/have/with) —
      "distinct" is this implementation's reading of the paper's
      "contain at least two of"; pass stopwords= to substitute a
      different list

    All thresholds parametrized; DuckDB mirror sql_gopher_rules() uses
    identical arithmetic, so the gate hashes match bit-for-bit."""
    stopwords = GOPHER_STOP if stopwords is None else stopwords
    w = F.filter(F.split(col, r"\s+"), lambda t: t != "")
    n_words = F.size(w)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(w, F.lit(0).cast("double"),
                    lambda acc, x: acc + F.length(x)) / n_words
    ).otherwise(F.lit(0.0))
    n_sym = (F.size(F.regexp_extract_all(col, F.lit(r"#|\.\.\."), 0)))
    lines = F.filter(F.split(col, "\n"), lambda s: F.trim(s) != "")
    n_lines = F.size(lines)
    bullet = F.when(n_lines > 0, F.size(F.filter(
        lines, lambda s: F.trim(s).rlike(r"^[-*•]"))) / n_lines
    ).otherwise(F.lit(0.0))
    ellip = F.when(n_lines > 0, F.size(F.filter(
        lines, lambda s: F.trim(s).rlike(r"\.\.\.$"))) / n_lines
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_words > 0,
        F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]"))) / n_words
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(tokens(col)),
        F.array(*[F.lit(s) for s in stopwords])))
    rules = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ratio_ok": F.when(
            n_words > 0, n_sym / n_words <= max_symbol_ratio
        ).otherwise(F.lit(False)),
        "bullet_ratio_ok": bullet <= max_bullet_ratio,
        "ellipsis_ratio_ok": ellip <= max_ellipsis_ratio,
        "alpha_word_ok": alpha_ratio >= min_alpha_word_ratio,
        "stopword_ok": stop_hits >= min_stop_hits,
    }
    ok = F.lit(True)
    for c in rules.values():
        ok = ok & c
    rules["pass"] = ok
    return rules


def sql_gopher_rules(x: str, min_words: int = 50,
                     max_words: int = 100_000,
                     min_stop_hits: int = 2,
                     stopwords=None) -> dict[str, str]:
    """DuckDB mirrors of gopher_rules (same fixed 3/10/0.1/0.9/0.3/0.8
    thresholds, same Gopher 8-word required list)."""
    stopwords = GOPHER_STOP if stopwords is None else stopwords
    w = f"list_filter(regexp_split_to_array({x}, '\\s+'), t -> t <> '')"
    nw = f"len({w})"
    mean = (f"CASE WHEN {nw} > 0 THEN "
            f"list_sum(list_transform({w}, t -> length(t))) * 1.0 / {nw} "
            f"ELSE 0.0 END")
    nsym = f"len(regexp_extract_all({x}, '#|\\.\\.\\.'))"
    lines = (f"list_filter(regexp_split_to_array({x}, '\\n'), "
             f"s -> trim(s) <> '')")
    nl = f"len({lines})"
    bullet = (f"CASE WHEN {nl} > 0 THEN len(list_filter({lines}, "
              f"s -> regexp_matches(trim(s), '^[-*•]'))) * 1.0 "
              f"/ {nl} ELSE 0.0 END")
    ellip = (f"CASE WHEN {nl} > 0 THEN len(list_filter({lines}, "
             f"s -> regexp_matches(trim(s), '\\.\\.\\.$'))) * 1.0 "
             f"/ {nl} ELSE 0.0 END")
    alpha = (f"CASE WHEN {nw} > 0 THEN len(list_filter({w}, "
             f"t -> regexp_matches(t, '[a-zA-Z]'))) * 1.0 / {nw} "
             f"ELSE 0.0 END")
    stops = ", ".join(f"'{s}'" for s in stopwords)
    sh = (f"len(list_intersect(list_distinct({sql_tokens(x)}), "
          f"[{stops}]))")
    return {
        "word_count_ok": f"({nw} >= {min_words} AND {nw} <= {max_words})",
        "mean_word_len_ok": f"({mean} >= 3.0 AND {mean} <= 10.0)",
        "symbol_ratio_ok": (f"(CASE WHEN {nw} > 0 THEN "
                            f"{nsym} * 1.0 / {nw} <= 0.1 "
                            f"ELSE FALSE END)"),
        "bullet_ratio_ok": f"({bullet} <= 0.9)",
        "ellipsis_ratio_ok": f"({ellip} <= 0.3)",
        "alpha_word_ok": f"({alpha} >= 0.8)",
        "stopword_ok": f"({sh} >= {min_stop_hits})",
    }
