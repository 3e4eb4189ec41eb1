"""Text-analysis operators for large-scale training-data pipelines.

All native DataFrame ops (no Python UDFs): tokenization is
split+posexplode, hashes are ``F.md5``, fingerprints are window
functions — everything stays JVM-side in whole-stage codegen and
scales linearly with a shuffle only at the per-document groupBy.

Operators: tokenization, shingling, token/quality stats, n-gram
language-ID heuristic, SimHash-style fingerprint, winnowing (rolling
hash) fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# Small english-ish stopword list (public knowledge); parameterizable.
DEFAULT_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it")

_HEX = "0123456789abcdef"


def tokenize(df: DataFrame, id_col: str, text_col: str, *, sep: str = " ") -> DataFrame:
    """One row per (id, pos, token); pos is 1-based (matches SQL
    ``generate_subscripts``). Order within a document is preserved by
    ``posexplode`` so downstream window functions can rebuild it.
    ``sep`` is a LITERAL separator (quoted with \\Q…\\E — F.split takes
    a regex, so a raw '|' or '.' would otherwise split per character)."""
    return df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), f"\\Q{sep}\\E")).alias(
            "pos0", "token"
        ),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "token")


def shingles(
    tokens: DataFrame, id_col: str, *, k: int = 3, out_col: str = "shingle"
) -> DataFrame:
    """k-token shingles via lead windows over token order. NULL-propagating
    concat (``F.concat``) drops the <k-sized tail, matching `a || b` SQL."""
    w = W.partitionBy(id_col).orderBy("pos")
    parts: list[Column] = []
    for i in range(k):
        if i:
            parts.append(F.lit(" "))
        parts.append(F.lead("token", i).over(w) if i else F.col("token"))
    return (
        tokens.withColumn(out_col, F.concat(*parts))
        .where(F.col(out_col).isNotNull())
        .select(id_col, "pos", out_col)
    )


def token_shingle_array(text_col: Column, *, k: int = 3, sep: str = " ") -> Column:
    """Row-local array of k-token shingles (ordered by start position) —
    the building block shared by the exploding shingle frames and the
    in-row distinct sets used by near-dup. ``sep`` is literal (\\Q…\\E
    quoted), not a regex."""
    toks = F.split(text_col, f"\\Q{sep}\\E")
    n = F.size(toks)
    starts = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, k), " "))


def char_shingle_array(text_col: Column, *, k: int = 8) -> Column:
    """Row-local array of character k-grams (ordered by offset)."""
    n = F.length(text_col)
    starts = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(starts, lambda i: text_col.substr(i, F.lit(k)))


def shingles_from_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    out_col: str = "shingle",
    sep: str = " ",
) -> DataFrame:
    """k-token shingles computed row-locally from the text column —
    zero shuffle. ``slice``/``array_join`` over the split-token array
    replaces the tokenize→posexplode→lead-window pipeline, which costs
    a partitionBy(id) sort per consumer; at 100 TB that sort is pure
    waste since every shingle is derivable within its own row.
    Output (id, pos, shingle) is identical to
    ``shingles(tokenize(df, ...))`` — pos is the 1-based position of
    the shingle's first token."""
    sh = token_shingle_array(F.col(text_col), k=k, sep=sep)
    return df.select(id_col, F.posexplode(sh).alias("pos0", out_col)).select(
        id_col, (F.col("pos0") + 1).alias("pos"), out_col
    )


def char_shingles_from_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    out_col: str = "shingle",
) -> DataFrame:
    """Character k-grams, row-local like ``shingles_from_text`` (zero
    shuffle): substr windows over the raw text. Char shingles are the
    standard alternative to token shingles for near-dup detection on
    noisy text (tokenization-free, robust to spacing/punctuation
    differences). Output (id, pos, shingle); pos = 1-based char
    offset."""
    sh = char_shingle_array(F.col(text_col), k=k)
    return df.select(id_col, F.posexplode(sh).alias("pos0", out_col)).select(
        id_col, (F.col("pos0") + 1).alias("pos"), out_col
    )


def token_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    punct_class: str = r"[.,!?;:]",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality features: token count, char count, average
    token length, stopword ratio, punctuation ratio. These are the
    standard cheap quality filters (length / stopword density / symbol
    density) for pretraining-corpus curation. ``keep_cols`` ride along
    in the projection (zero-shuffle alternative to re-joining metadata
    back on afterwards)."""
    # Split once in a projection; downstream expressions reuse the array
    # column instead of re-splitting per stat.
    with_toks = df.select(
        id_col,
        *keep_cols,
        F.col(text_col).alias("_txt"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    n_tok = F.size(F.col("_toks"))
    n_chars = F.length(F.col("_txt"))
    n_stop = F.size(F.filter(F.col("_toks"), lambda t: t.isin(*stopwords)))
    n_punct = F.size(F.regexp_extract_all(F.col("_txt"), F.lit(punct_class), F.lit(0)))
    avg_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    return with_toks.select(
        id_col,
        *keep_cols,
        n_tok.cast("long").alias("token_count"),
        n_chars.cast("long").alias("char_count"),
        (F.round((avg_len.cast("double")) * 10000.0) / 10000.0).alias("avg_token_len"),
        (F.round(((n_stop / n_tok).cast("double")) * 10000.0) / 10000.0).alias("stopword_ratio"),
        # empty text ⇒ n_chars=0: NULL ratio, not an ANSI
        # DIVIDE_BY_ZERO crash (a quality gate must SURVIVE the rows
        # it exists to reject; n_tok is never 0 — split('') = [''])
        (F.round((F.when(n_chars > 0, (n_punct / n_chars)).cast("double")) * 10000.0) / 10000.0).alias("punct_ratio"),
    )


def bpe_ish_token_count(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "bpe_tokens"
) -> DataFrame:
    """Sub-word-ish token estimate: word chunks of ≤4 chars + punctuation,
    via one regexp pass (the usual ~chars/4 BPE heuristic, computed
    exactly rather than divided)."""
    pat = F.lit(r"\w{1,4}|[^\w\s]")
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(F.col(text_col), pat, F.lit(0)))
        .cast("long")
        .alias(out_col),
    )


def language_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keyword_sets: dict[str, tuple[str, ...]],
) -> DataFrame:
    """Keyword-hit-ratio language ID: for each language, the fraction of
    tokens found in its keyword set; prediction = argmax with
    alphabetical tie-break. A broadcastable, UDF-free heuristic — the
    real-corpus version swaps the keyword sets for per-language n-gram
    tables via the same broadcast-join shape."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    scored = df.select(
        id_col,
        *[
            (F.round(((F.size(F.filter(toks, lambda t: t.isin(*kws))) / n_tok).cast("double")) * 10000.0) / 10000.0).alias(f"score_{lang}")
            for lang, kws in sorted(keyword_sets.items())
        ],
    )
    langs = sorted(keyword_sets)
    if not langs:
        raise ValueError("language_scores needs at least one keyword set")
    # F.greatest demands >= 2 columns; a one-language call is a
    # legitimate single-filter use (code-review r5)
    best = (
        F.col(f"score_{langs[0]}")
        if len(langs) == 1
        else F.greatest(*[F.col(f"score_{l}") for l in langs])
    )
    pred = F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )
    return scored.withColumn("predicted_lang", pred)


def _hex_val(c: Column) -> Column:
    return F.instr(F.lit(_HEX), c) - 1


def simhash16(tokens: DataFrame, id_col: str) -> DataFrame:
    """SimHash-style 16-position fingerprint: per md5 hex position, the
    majority-weighted digit (avg ≥ 7.5 → bit 1), weighted by token
    frequency. Near-identical documents agree on nearly all positions.
    One groupBy with 16 aggregates — a single shuffle on doc id."""
    # Hash once per row in a projection — 16 agg expressions otherwise
    # each recompute md5 (no CSE across aggregate expressions).
    hashed = tokens.select(id_col, F.md5(F.col("token")).alias("_h"))
    aggs = [
        F.avg(_hex_val(F.substring(F.col("_h"), p, 1))).alias(f"_a{p}")
        for p in range(1, 17)
    ]
    per_doc = hashed.groupBy(id_col).agg(*aggs)
    bits = [
        F.when(F.col(f"_a{p}") >= 7.5, F.lit("1")).otherwise(F.lit("0"))
        for p in range(1, 17)
    ]
    return per_doc.select(id_col, F.concat(*bits).alias("simhash"))


def winnow_fingerprints(
    tokens: DataFrame, id_col: str, *, k: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): hash k-shingles, take the
    min hash in each sliding window of ``window`` shingles, keep the
    distinct mins per document. Output: (id, n_fingerprints)."""
    sh = shingles(tokens, id_col, k=k)
    h = F.md5(F.col("shingle"))
    w = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    # Only FULL windows select fingerprints (code-review r5): the
    # rowsBetween frame CLIPS at the partition end, so the trailing
    # window-1 partial frames would unconditionally fingerprint every
    # document's final shingle (up to window-1 spurious mins per doc),
    # deviating from Schleimer et al.'s guarantee. Positions are
    # 1-based and contiguous, so full windows start at
    # pos <= n_shingles - window + 1; a doc shorter than one window
    # keeps its single global min (pos == 1) so every doc still
    # fingerprints.
    n_sh = F.count(F.lit(1)).over(W.partitionBy(id_col))
    local_min = sh.select(
        id_col,
        "pos",
        F.min(h).over(w).alias("fp"),
        n_sh.alias("_n_sh"),
    ).where(F.col("pos") <= F.greatest(F.col("_n_sh") - (window - 1), F.lit(1)))
    return (
        local_min.groupBy(id_col)
        .agg(F.countDistinct("fp").alias("n_fingerprints"))
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document (idf = ln((N+1)/(df+1)) + 1, the
    smoothed sklearn form). Two aggregations — term frequency on
    (doc, token), document frequency on token — then a BROADCAST join
    of the vocabulary-sized df table back onto tf: vocabularies grow
    ~log-linearly with corpus size, so even a 100 TB corpus's df table
    fits an executor, and broadcasting avoids shuffling the (doc,
    token) frame a second time on the skew-prone token key (stopwords
    are exactly the hot keys a shuffle join would stumble on). N rides
    as a literal (one count job). Scores use scale-then-divide rounding
    (see jaccard_verify) so the SQL oracle agrees bit-for-bit; ranking
    is on the ROUNDED score with a token tie-break."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(F.broadcast(dfreq), "token").select(
        F.col(id_col),
        "token",
        F.col("tf").cast("long").alias("tf"),
        (F.round(F.col("tf") * idf * 10000) / 10000).alias("score"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


try:  # pyspark >= 3.5
    from pyspark.sql.functions import udtf as _udtf
except ImportError:  # pragma: no cover - older runtimes
    _udtf = None


if _udtf is not None:

    @_udtf(returnType="chunk_id: int, chunk: string")
    class FixedChunker:
        """Python UDTF: fixed-width character chunking as a LATERAL
        table function — the extensibility surface for row fan-out
        logic no built-in generator expresses (real uses: structure-
        aware splitters, tokenizer-boundary chunkers). Row-at-a-time
        Python, so it is NOT the hot path for plain fixed windows —
        `substring`/regex (see `doc_fixed_chunks_udtf`'s oracle) or
        `pack_token_budget` cover those natively at scale."""

        def eval(self, text: str, width: int):  # noqa: D102
            if not text or width is None or width <= 0:
                return
            for i in range(0, len(text), width):
                yield i // width, text[i : i + width]

else:  # pragma: no cover
    FixedChunker = None


def normalize_text(
    text_col: Column,
    *,
    lowercase: bool = True,
    strip_punct: str = r"[.,!?;:]",
    collapse_ws: bool = True,
) -> Column:
    """Standard corpus text normalization, entirely in codegen:
    lowercase → punctuation strip → whitespace collapse → trim. The
    canonical pre-dedup cleanup (near-dup recall improves when case and
    punctuation noise are gone). Each step is a toggle so pipelines can
    normalize exactly as far as their dedup key requires."""
    out = text_col
    if lowercase:
        out = F.lower(out)
    if strip_punct:
        out = F.regexp_replace(out, strip_punct, "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


# PII span patterns, deliberately conservative (precision over recall —
# a scrubber that eats ordinary prose is worse than one that misses an
# exotic phone format). Java-regex dialect; order matters: emails are
# scrubbed before phone shapes so a digit-bearing local-part can't be
# half-eaten, and IPv4 before phones so dotted quads aren't read as
# digit runs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (
        "phone",
        r"(?<![\w.])(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}(?!\w|\.\d)",
        "[PHONE]",
    ),
)


def scrub_pii(
    df: DataFrame,
    text_col: str,
    *,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    out_col: str = "scrubbed",
) -> DataFrame:
    """Regex PII redaction for corpus curation: replace every match of
    each (kind, pattern, marker) rule with its marker and append one
    ``n_<kind>`` count column per rule (``regexp_count`` — same scan,
    no second pass) plus the scrubbed text. Entirely codegen
    (``regexp_replace``/``regexp_count``), map-only, no shuffle — the
    shape that lets a scrub pass run as a pure narrow stage over 100 TB
    and fuse with whatever filter/write follows. Counting runs against
    the ORIGINAL text while replacement is sequential, so markers never
    feed later rules (no marker contains a scrubbable span).

    COUNT SEMANTICS (code-review r5): ``n_<kind>`` is DEFINED as the
    rule's match count in the ORIGINAL text, NOT the number of markers
    in the output — when two rules' spans overlap (an email whose
    local part embeds a phone-shaped token), the earlier rule's
    replacement consumes the span and the later rule's counted match
    produces no marker. Auditing that must reconcile against the
    redacted corpus should regexp_count the markers in ``out_col``
    instead."""
    out = F.col(text_col)
    counts = []
    for kind, pat, marker in patterns:
        counts.append(F.regexp_count(text_col, F.lit(pat)).alias(f"n_{kind}"))
        out = F.regexp_replace(out, pat, marker)
    return df.select("*", *counts, out.alias(out_col))


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    max_df_frac: float = 0.2,
) -> DataFrame:
    """All document pairs with TF-IDF cosine similarity >= threshold,
    via the inverted-index sparse formulation (Elsayed et al., ACL'08):
    cos(a,b) = Σ_t w_a(t)·w_b(t) / (‖a‖·‖b‖) decomposes over shared
    terms, so the pair dot products come from ONE self-join of the
    (doc, term, weight) posting list on term + a grouped sum — never a
    doc×doc product. The join's cost is Σ_t df(t)², which stopwords
    dominate quadratically; ``max_df_frac`` drops terms appearing in
    more than that fraction of documents from the weight space (the
    standard df-pruning knob — they carry ~zero idf signal but ~all of
    the join cost, and they are exactly the skewed shuffle keys).
    Weights use the smoothed sklearn idf (ln((N+1)/(df+1))+1, matching
    ``tfidf_top_terms``), QUANTIZED to exact milli-unit BIGINTs at the
    posting list (code-review r5): the pair dot products and norms are
    grouped SUMS, and float sums re-associate across partitions
    run-to-run — the CLAUDE.md gate-flake class, since both the 1e-4
    display round and the threshold membership hang off them. With
    integer weights every sum is exact and order-free (accumulated in
    DECIMAL(38,0) — per-term products reach ~1e14 at plausible tf·idf,
    so BIGINT headroom is thin at corpus scale), and the one float
    expression (dot/√(na²·nb²)) evaluates identically on identical
    exact operands. The single ln per (doc, token) is quantized at
    1e-3 — the documented display-site libm convention. Norms are
    computed over the SAME pruned space, so similarities stay true
    cosines of the pruned (quantized) vectors.
    The posting list is computed once and persisted (three consumers:
    norms + both join sides); it stays cached after the returned frame
    is consumed (it backs its lineage), so loop/service callers should
    ``spark.catalog.clearCache()`` between corpora — same constraint
    as ``dedup.near_duplicates``. Scale shape: shuffles on term
    (bounded by df pruning) and on doc id — linear, skew-capped."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.count()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    kept = dfreq.where(F.col("df") <= F.lit(float(n_docs) * max_df_frac))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    # vocab-sized side: broadcast keeps the posting list from shuffling
    # a second time on the skew-prone token key
    posting = (
        tf.join(F.broadcast(kept), "token")
        .select(
            F.col(id_col),
            "token",
            F.round(F.col("tf") * idf * 1000.0).cast("long").alias("w"),
        )
        .persist()
    )
    posting.count()  # materialize before AQE races the three consumers
    wd = F.col("w").cast("decimal(38,0)")
    norms2 = posting.groupBy(id_col).agg(
        F.sum(wd * F.col("w")).cast("decimal(38,0)").alias("n2")
    )
    pa = posting.select(F.col(id_col).alias("doc_a"), "token", F.col("w").alias("w_a"))
    pb = posting.select(
        F.col(id_col).alias("doc_b"),
        F.col("token").alias("token_b"),
        F.col("w").alias("w_b"),
    )
    dots = (
        pa.join(pb, (pa.token == pb.token_b) & (pa.doc_a < pb.doc_b))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("w_a").cast("decimal(38,0)") * F.col("w_b"))
            .cast("decimal(38,0)")
            .alias("dot")
        )
    )
    na = norms2.select(F.col(id_col).alias("doc_a"), F.col("n2").alias("n2_a"))
    nb = norms2.select(F.col(id_col).alias("doc_b"), F.col("n2").alias("n2_b"))
    # n2 > 0 by construction (tf >= 1, idf >= 1 → w >= 1000), so the
    # division is ANSI-total; docs with NO surviving terms have no
    # postings and thus no pairs at all. All operands below are exact
    # integers, so the float expression — and therefore the rounded
    # value AND the threshold membership — is run- and
    # partition-invariant.
    cos = (
        F.round(
            F.col("dot").cast("double")
            * 10000.0
            / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double"))
        )
        / 10000.0
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def phrase_merge_rounds(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    rounds: int = 4,
    final_total: bool = True,
) -> tuple[list[tuple[str, str, int, int]], DataFrame]:
    """BPE-style merge training over the corpus (word-level symbols —
    the phrase variant of the byte-pair loop tokenizer training runs):
    per round, count ADJACENT symbol pairs corpus-wide, pick the most
    frequent (count DESC, pair ASC tie-break), and greedily rewrite
    every document left-to-right replacing each (a, b) occurrence with
    the merged symbol ``a + ' ' + b``.

    100 TB shape: this is the canonical tokenizer-training loop — the
    mutable state crossing the driver per round is ONE pair (O(1));
    pair counting is a vocabulary²-bounded shuffle with map-side
    combine (pairs are built IN-ROW, never via a position self-join);
    the rewrite is a map-only in-row left fold. ``rounds`` bounds the
    job count exactly like the kmeans/pagerank fixed unrolling.

    DETERMINISM: counts are exact integers; the greedy rewrite folds
    left-to-right (``F.aggregate`` ↔ DuckDB ``list_reduce``, both left
    folds — overlapping occurrences like "a a a" under merge (a, a)
    resolve identically); sentinel-seeded so the accumulator is
    list-typed on both engines (``F.get`` / DuckDB OOB indexing return
    NULL, never throw, on the empty prefix). The sentinel is NULL, not
    '' — ``F.split`` on ' ' yields GENUINE empty-string tokens for
    leading/double spaces, so '' is a reachable real symbol and an ''
    sentinel would phantom-merge a learned ('' , b) pair at position 0
    (ADVICE r4); NULL never equals any real token under ``==`` (split
    never yields NULL), so the seed can't match.

    JOB SHAPE (VERDICT r6 item 3 — this loop was the bench's slowest
    family at 5.4 s/entry): ONE driver job per round. The round job
    computes the pair counts AND, in the same aggregate, the corpus
    pair total; the top pair falls out of a single ``min(struct(-cnt,
    a, b))`` (integer negation is exact, struct ordering is
    lexicographic — same (cnt DESC, a ASC, b ASC) total order as the
    oracle's ORDER BY). Because every document of ``size`` tokens
    contributes exactly ``size - 1`` adjacent pairs, the previous
    round's ``total_tokens_after`` is just ``pair_total + n_docs`` —
    no separate count job. The rewritten frame is persisted LAZILY:
    the next round's pair job materializes the cache as it scans
    (consumers are strictly sequential, so the AQE racing-writers
    hazard doesn't apply), replacing the dedicated per-round
    localCheckpoint job — which still cuts the O(rounds²) fold
    re-evaluation the checkpoint used to, via cache hits. Only the
    LAST round pays a dedicated total-tokens job (nothing later scans
    its output).

    Returns (per-round stats [(a, b, pair_count, total_tokens_after)],
    final tokenized frame ``(id_col, toks)``)."""
    toks = docs.select(
        id_col, F.split(F.col(text_col), " ").alias("toks")
    ).persist()
    empty_pairs = F.expr("array()").cast("array<struct<a:string,b:string>>")
    # One (NULL, NULL) marker "pair" per non-NULL document rides the
    # same explode: its group count IS n_docs (real tokens are never
    # NULL, so the marker can't collide), letting the round job also
    # deliver the document count the Σsize = Σpairs + n_docs identity
    # needs — no separate count job. NULL-text rows contribute neither
    # pairs nor a marker (they carry no tokens).
    null_marker = F.when(
        F.col("toks").isNotNull(),
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("a"),
                F.lit(None).cast("string").alias("b"),
            )
        ),
    ).otherwise(empty_pairs)
    stats: list[list] = []
    n_docs = 0
    prev: DataFrame | None = None
    # Tracks whether the CURRENT `toks` generation's cache has been
    # materialized by an action — the release of its persisted parent
    # below is only safe/cheap once it has (ADVICE r6).
    toks_mat = False
    for _ in range(rounds):
        pairs = toks.select(
            F.explode(
                F.concat(
                    F.when(
                        F.size("toks") >= 2,
                        F.expr(
                            "transform(sequence(1, size(toks) - 1), "
                            "i -> struct(toks[i-1] AS a, toks[i] AS b))"
                        ),
                    ).otherwise(empty_pairs),
                    null_marker,
                )
            ).alias("p")
        ).select("p.a", "p.b")
        real = F.col("a").isNotNull()
        row = (
            pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .agg(
                F.min(
                    F.when(
                        real,
                        F.struct(
                            (-F.col("cnt")).alias("nc"), F.col("a"), F.col("b")
                        ),
                    )
                ).alias("top"),
                F.sum(F.when(real, F.col("cnt"))).cast("long").alias("pair_total"),
                F.sum(F.when(~real, F.col("cnt"))).cast("long").alias("n_docs"),
            )
            .collect()[0]
        )
        n_docs = int(row["n_docs"] or 0)
        toks_mat = True
        if stats:
            # this round's pair total is over the PREVIOUS round's
            # rewrite output: backfill its total_tokens_after
            stats[-1][3] = int(row["pair_total"] or 0) + n_docs
        # the collect above materialized the CURRENT generation's
        # cache, so its parent (the previous generation) can only be
        # touched again by a lost-partition recompute — release it
        # rather than hold `rounds` corpus copies in cache at once
        # (self-review r6; matters at real scale, not sf0.1).
        if prev is not None:
            prev.unpersist(blocking=False)
        prev = toks
        if row["top"] is None:
            break
        a, b, cnt = row["top"]["a"], row["top"]["b"], -int(row["top"]["nc"])
        merged = f"{a} {b}"
        la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)
        if a != b:
            # Vectorized rewrite: when a ≠ b, matches can never
            # overlap — a match at i-1 forces toks[i] == b ≠ a, which
            # contradicts a match at i — so EVERY match merges and the
            # greedy fold collapses to an O(n) positional transform
            # (merge site → merged symbol, consumed successor → NULL →
            # filtered; real tokens are never NULL, so the placeholder
            # can't collide). Equivalent to the fold by the
            # non-overlap argument; pinned by
            # test_phrase_merge_vectorized_equals_fold.
            def _melt(i):
                cur = F.get("toks", i)
                match_here = (cur == la) & (F.get("toks", i + 1) == lb)
                consumed = (F.get("toks", i - 1) == la) & (cur == lb)
                return (
                    F.when(match_here, lm)
                    .when(consumed, F.lit(None).cast("string"))
                    .otherwise(cur)
                )

            rewritten = F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 1), _melt
                ),
                lambda x: x.isNotNull(),
            )
        else:
            # a == b: overlapping runs ("a a a") resolve left-to-right
            # — keep the sequential fold. NULL sentinel: unreachable
            # (real tokens are never NULL; '' IS reachable via double
            # spaces) — NULL == a yields NULL, which when() treats as
            # no-match.
            rewritten = F.aggregate(
                "toks",
                F.array(F.lit(None).cast("string")),
                lambda acc, x: F.when(
                    (F.get(acc, F.size(acc) - 1) == la) & (x == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(lm)
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
                lambda acc: F.slice(acc, 2, F.size(acc) - 1),
            )
        toks = toks.select(id_col, rewritten.alias("toks")).persist()
        toks_mat = False
        stats.append([a, b, cnt, None])
    if final_total and stats and stats[-1][3] is None:
        # the only total no later pair job delivers; callers that
        # ignore the stats (the encode entry) pass final_total=False
        # and skip this job — their last stats row keeps total=None.
        total_after = toks.agg(
            F.sum(F.size("toks")).cast("long").alias("t")
        ).collect()[0]["t"]
        stats[-1][3] = int(total_after)
        toks_mat = True
    # Release the final generation's persisted PARENT (ADVICE r6): the
    # caller only holds the returned frame, so a lingering parent cache
    # would pin a second corpus-sized copy with no release path. If no
    # action has materialized the returned frame yet (final_total=False
    # after a full-rounds run), do it first — otherwise the caller's
    # first action would recompute the whole generation chain.
    if prev is not None and prev is not toks:
        if not toks_mat:
            toks.count()
        prev.unpersist(blocking=False)
    return [tuple(s) for s in stats], toks
