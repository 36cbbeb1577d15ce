"""DuckDB oracle-SQL builders.

Every ``queries()`` entry in __spark_entry__.py has an ANSI-SQL twin
built here. The SQL is generated from the SAME constants (regex
patterns, thresholds, weights, synthetic-derivation spec) the Spark
expression library uses, so both sides independently evaluate one
declared semantics. DuckDB function mapping:

  Spark regexp_count(c, p)   -> len(regexp_extract_all(c, p))
  Spark c.rlike(p)           -> regexp_matches(c, p)
  Spark split(trim(c),'\\s+') -> string_split_regex(trim(c), '\\s+')
  Spark aggregate/transform  -> list_sum / list_transform
"""

from __future__ import annotations

from .functions import quality as Q
from .functions.rounding import sql_stable_round
from .functions.patterns import (
    LANG_MARKERS,
    LANG_ZH_CLASS,
    REPEAT4_RUN,
    SPAM_PATTERNS,
    SPAM_PUNCT_CLASS,
)
from .sources.reviews import NOW_LITERAL, SYNTH_REVIEWS_SQL



def sql_ws_trim(c: str) -> str:
    """Whitespace-strip (Python str.strip semantics) — DuckDB trim()
    strips spaces only, mirroring functions/text_features.py:ws_trim."""
    return (
        f"regexp_replace(regexp_replace(COALESCE({c}, ''), "
        f"'^\\s+', ''), '\\s+$', '')"
    )

def rc(expr: str, pattern: str) -> str:
    """regexp_count in DuckDB. Pattern single-quotes must be doubled."""
    p = pattern.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{p}'))"


def rlike(expr: str, pattern: str) -> str:
    p = pattern.replace("'", "''")
    return f"regexp_matches({expr}, '{p}')"


# ---------------- text features (T1-T7) ----------------

def sql_word_count(c: str) -> str:
    t = sql_ws_trim(c)
    return (
        f"CASE WHEN {c} IS NULL OR len({t}) = 0 THEN 0 "
        f"ELSE len(string_split_regex({t}, '\\s+')) END"
    )


def sql_char_count(c: str) -> str:
    return f"COALESCE(len({c}), 0)"


def sql_sentence_count(c: str) -> str:
    coalesced = f"COALESCE({c}, '')"
    return f"greatest(1, {rc(coalesced, '[.!?]')})"


def sql_avg_word_length(c: str) -> str:
    words = f"string_split_regex({sql_ws_trim(c)}, '\\s+')"
    stripped_len = (
        "len(regexp_replace(regexp_replace(w, '^[.,!?;:]+', ''), "
        "'[.,!?;:]+$', ''))"
    )
    return (
        f"CASE WHEN {c} IS NULL OR len({sql_ws_trim(c)}) = 0 THEN 0.0 "
        f"ELSE {sql_stable_round(f'CAST(list_sum(list_transform({words}, w -> {stripped_len})) AS DOUBLE) / len({words})', 2)} END"
    )


def sql_caps_ratio(c: str) -> str:
    ns = f"len(replace(COALESCE({c}, ''), ' ', ''))"
    caps = rc(f"COALESCE({c}, '')", "[A-Z]")
    return (
        f"CASE WHEN {ns} = 0 THEN 0.0 "
        f"ELSE {sql_stable_round(f'CAST({caps} AS DOUBLE) / {ns}', 2)} END"
    )


def sql_punct_ratio(c: str) -> str:
    punct = rc(f"COALESCE({c}, '')", "[.,!?;:'\"()\\-]")
    return (
        f"CASE WHEN {c} IS NULL OR len({c}) = 0 THEN 0.0 "
        f"ELSE {sql_stable_round(f'CAST({punct} AS DOUBLE) / len({c})', 2)} END"
    )


def sql_digit_ratio(c: str) -> str:
    digits = rc(f"COALESCE({c}, '')", "[0-9]")
    return (
        f"CASE WHEN {c} IS NULL OR len({c}) = 0 THEN 0.0 "
        f"ELSE {sql_stable_round(f'CAST({digits} AS DOUBLE) / len({c})', 2)} END"
    )


def sql_alpha_ratio(c: str) -> str:
    alpha = rc(f"COALESCE({c}, '')", "[A-Za-z]")
    return (
        f"CASE WHEN {c} IS NULL OR len({c}) = 0 THEN 0.0 "
        f"ELSE CAST({alpha} AS DOUBLE) / len({c}) END"
    )


# ---------------- spam + scores (F4, Q1-Q5) ----------------

def sql_spam_hits(c: str) -> str:
    lc = f"lower(COALESCE({c}, ''))"
    terms = [f"(CASE WHEN {rlike(lc, p)} THEN 1 ELSE 0 END)" for p in SPAM_PATTERNS]
    return "(" + " + ".join(terms) + ")"


def sql_completeness(req: list[str], opt: list[str]) -> str:
    req_sum = " + ".join(
        f"(CASE WHEN {c} IS NOT NULL THEN 1.0 ELSE 0.0 END)" for c in req
    )
    opt_sum = " + ".join(
        f"(CASE WHEN {c} IS NOT NULL THEN 1.0 ELSE 0.0 END)" for c in opt
    )
    return f"((({req_sum}) / 6.0) * 0.8 + (({opt_sum}) / 3.0) * 0.2)"


def sql_validity(text: str, rating: str) -> str:
    n = f"COALESCE(len({text}), 0)"
    text_score = (
        f"(CASE WHEN {n} >= {Q.TEXT_MIN_LEN} AND {n} <= {Q.TEXT_MAX_LEN} THEN 1.0 "
        f"WHEN {n} < {Q.TEXT_MIN_LEN} THEN CAST({n} AS DOUBLE) / {float(Q.TEXT_MIN_LEN)} "
        f"ELSE {float(Q.TEXT_MAX_LEN)} / CAST({n} AS DOUBLE) END)"
    )
    rating_score = (
        f"(CASE WHEN {rating} IS NULL THEN 0.0 "
        f"WHEN {rating} >= 1.0 AND {rating} <= 5.0 THEN 1.0 ELSE 0.0 END)"
    )
    return f"(({text_score} + {rating_score}) / 2.0)"


def sql_freshness(date: str, now: str) -> str:
    age = (
        f"(CAST(date_part('epoch', {now}) - date_part('epoch', {date}) AS DOUBLE)"
        f" / 3600.0)"
    )
    full, mx = Q.FRESH_FULL_HOURS, Q.FRESH_MAX_HOURS
    return (
        f"(CASE WHEN {date} IS NULL THEN 0.0 "
        f"WHEN {age} < 0.0 THEN 0.0 "
        f"WHEN {age} <= {full} THEN 1.0 - ({age} / {full}) * 0.5 "
        f"WHEN {age} <= {mx} THEN 0.5 * (1.0 - ({age} - {full}) / {mx - full}) "
        f"ELSE 0.0 END)"
    )


def sql_spam_score(text: str, original: str) -> str:
    lc = f"lower(COALESCE({text}, ''))"
    n = f"COALESCE(len({text}), 0)"
    hits = sql_spam_hits(text)
    punct = rc(lc, SPAM_PUNCT_CLASS)
    punct_pen = (
        f"(CASE WHEN {n} > 0 AND CAST({punct} AS DOUBLE) / {n} > 0.3 "
        f"THEN 0.3 ELSE 0.0 END)"
    )
    orig = f"COALESCE({original}, '')"
    caps_pen = (
        f"(CASE WHEN {rc(orig, '[a-z]')} = 0 AND {rc(orig, '[A-Z]')} > 0 "
        f"AND {n} > 10 THEN 0.4 ELSE 0.0 END)"
    )
    runs = rc(lc, REPEAT4_RUN)
    runs_pen = f"(CASE WHEN {runs} > 2 THEN 0.2 ELSE 0.0 END)"
    digits = rc(lc, "[0-9]")
    digit_pen = (
        f"(CASE WHEN {n} > 0 AND CAST({digits} AS DOUBLE) / {n} > 0.3 "
        f"THEN 0.3 ELSE 0.0 END)"
    )
    raw = (
        f"(1.0 - 0.3 * CAST({hits} AS DOUBLE) - {punct_pen} - {caps_pen} "
        f"- {runs_pen} - {digit_pen})"
    )
    return f"greatest(0.0, least(1.0, {raw}))"


def sql_dq_score(comp: str, val: str, fresh: str, spam: str) -> str:
    expr = (
        f"{Q.W_COMPLETENESS} * {comp} + {Q.W_VALIDITY} * {val} "
        f"+ {Q.W_FRESHNESS} * {fresh} + {Q.W_SPAM} * {spam}"
    )
    return sql_stable_round(expr, 2)


# ---------------- gauntlet CTE ----------------

def gauntlet_cte() -> str:
    """CTE chain: reviews -> v (predicates + text_clean + fatal_stage).

    Mirrors operators/gauntlet.py:validate_reviews stage-for-stage.
    """
    hits = sql_spam_hits("text")
    tc_ws = sql_ws_trim("text_clean")
    supported = ", ".join(f"'{lang}'" for lang in Q.SUPPORTED_LANGUAGES)
    return f"""
reviews AS ({SYNTH_REVIEWS_SQL}),
v AS (
  SELECT *,
    (text IS NULL OR len(text) = 0) AS p1,
    (rating IS NULL OR rating = 0.0) AS p2,
    (language NOT IN ({supported})) AS p3,
    (language_confidence < {Q.LANG_CONFIDENCE_THRESHOLD}) AS p4,
    {hits} AS spam_hits,
    ({hits} >= 2) AS p5,
    (COALESCE(len(text), 0) < {Q.TEXT_MIN_LEN}) AS p6,
    (COALESCE(len(text), 0) > {Q.TEXT_MAX_LEN}) AS p7,
    (NOT (rating >= 1.0 AND rating <= 5.0)) AS p8,
    COALESCE(len(text), 0) AS tlen,
    (CASE WHEN COALESCE(len(text), 0) > {Q.TEXT_MAX_LEN}
          THEN substr(text, 1, {Q.TEXT_MAX_LEN}) ELSE text END) AS text_clean
  FROM reviews
),
g AS (
  SELECT *,
    (len({tc_ws}) = 0
     OR {sql_alpha_ratio(tc_ws)} < 0.4) AS p9
  FROM v
),
staged AS (
  SELECT *,
    CASE WHEN p1 THEN 1 WHEN p2 THEN 2 WHEN p3 THEN 3 WHEN p5 THEN 5
         WHEN p6 THEN 6 WHEN p8 THEN 8 WHEN p9 THEN 9 END AS fatal_stage
  FROM g
)"""


def accepted_select() -> str:
    """SELECT producing the CLEANED_REVIEW shape from ``staged``
    (accepted rows only), mirroring operators/gauntlet.py:clean_reviews."""
    now = f"TIMESTAMP '{NOW_LITERAL}'"
    comp = sql_completeness(
        ["review_id", "business_id", "user_id", "text_clean", "rating", "date"],
        ["useful", "funny", "cool"],
    )
    val = sql_validity("text_clean", "rating")
    fresh = sql_freshness("date", now)
    spam = sql_spam_score("text_clean", "text")
    dq = sql_dq_score(comp, val, fresh, spam)
    return f"""
SELECT
  review_id, business_id, user_id, rating,
  text_clean AS text, date,
  useful AS useful_count, funny AS funny_count, cool AS cool_count,
  {sql_word_count('text_clean')} AS word_count,
  {sql_char_count('text_clean')} AS char_count,
  {sql_sentence_count('text_clean')} AS sentence_count,
  {sql_avg_word_length('text_clean')} AS avg_word_length,
  language, language_confidence,
  {dq} AS data_quality_score,
  FALSE AS is_spam,
  ({dq} < {Q.ANOMALY_THRESHOLD}) AS is_anomaly,
  source, ingestion_timestamp,
  {now} AS processing_timestamp
FROM staged WHERE fatal_stage IS NULL"""


def issues_select() -> str:
    """UNION ALL producing the QUALITY_ISSUE dead-letter rows from
    ``staged`` — flags emitted only when their stage is reached."""
    now = f"TIMESTAMP '{NOW_LITERAL}'"

    def issue_row(where: str, itype: str, field: str, og: str, rng: str, sev: int) -> str:
        return f"""
SELECT review_id, '{itype}' AS issue_type, '{field}' AS field_name,
       {og} AS og_value, '{rng}' AS expected_range,
       {sev} AS severity, {now} AS detected_at,
       'validation' AS detection_range
FROM staged WHERE {where}"""

    parts = [
        issue_row(
            "p4 AND (fatal_stage IS NULL OR fatal_stage > 4)",
            "wrong_language",
            "text",
            "CAST(language_confidence AS VARCHAR)",
            ">=0.8 confidence",
            6,
        ),
        issue_row(
            "p7 AND (fatal_stage IS NULL OR fatal_stage > 7)",
            "too_long",
            "text",
            "CAST(tlen AS VARCHAR)",
            "<=5000 chars",
            5,
        ),
        issue_row("fatal_stage = 1", "missing_value", "text", "CAST(NULL AS VARCHAR)", "non-empty", 10),
        issue_row("fatal_stage = 2", "missing_value", "rating", "CAST(rating AS VARCHAR)", "1-5", 10),
        issue_row("fatal_stage = 3", "unsupported_language", "text", "language", "en", 8),
        issue_row("fatal_stage = 5", "spam_detected", "text", "CAST(spam_hits AS VARCHAR)", "<2 patterns", 9),
        issue_row("fatal_stage = 6", "too_short", "text", "CAST(tlen AS VARCHAR)", ">=10 chars", 7),
        issue_row("fatal_stage = 8", "out_of_range", "rating", "CAST(rating AS VARCHAR)", "1-5", 10),
        issue_row("fatal_stage = 9", "invalid_format", "text", "CAST(NULL AS VARCHAR)", "alpha_ratio>=0.4", 10),
    ]
    return " UNION ALL ".join(parts)


# ---------------- language ID heuristic ----------------

def sql_lang_id(c: str) -> tuple[str, str]:
    """(language_expr, confidence_expr) mirroring
    functions/language.py:lang_id_struct."""
    lc = f"lower(COALESCE({c}, ''))"
    zh = rc(lc, LANG_ZH_CLASS)
    h = {lang: rc(lc, pat) for lang, pat in LANG_MARKERS.items()}
    wst = sql_ws_trim(lc)
    words = (
        f"(CASE WHEN len({wst}) = 0 THEN 0 "
        f"ELSE len(string_split_regex({wst}, '\\s+')) END)"
    )
    cond_en = f"({h['en']} >= {h['es']} AND {h['en']} >= {h['fr']} AND {h['en']} >= {h['de']} AND {h['en']} > 0)"
    cond_es = f"({h['es']} >= {h['fr']} AND {h['es']} >= {h['de']} AND {h['es']} > 0)"
    cond_fr = f"({h['fr']} >= {h['de']} AND {h['fr']} > 0)"
    cond_de = f"({h['de']} > 0)"
    lang_expr = (
        f"(CASE WHEN {zh} > 0 THEN 'zh' WHEN {cond_en} THEN 'en' "
        f"WHEN {cond_es} THEN 'es' WHEN {cond_fr} THEN 'fr' "
        f"WHEN {cond_de} THEN 'de' ELSE 'unknown' END)"
    )
    best = (
        f"(CASE WHEN {zh} > 0 THEN {zh} WHEN {cond_en} THEN {h['en']} "
        f"WHEN {cond_es} THEN {h['es']} WHEN {cond_fr} THEN {h['fr']} "
        f"WHEN {cond_de} THEN {h['de']} ELSE 0 END)"
    )
    conf_expr = (
        f"(CASE WHEN {words} = 0 OR {best} = 0 THEN 0.0 "
        f"ELSE {sql_stable_round(f'least(1.0, CAST({best} AS DOUBLE) / {words})', 2)} END)"
    )
    return lang_expr, conf_expr


# ---------------- dedup / similarity / text-analysis extensions ----------------

from .operators.dedup import (  # noqa: E402
    LSH_BANDS,
    LSH_ROWS_PER_BAND,
    MINHASH_K,
)
from .operators.similarity import hyperplane  # noqa: E402
from .operators.text_analysis import STOPWORDS, TOKEN_REGEX  # noqa: E402

NEAR_DUP_CORPUS_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL
SELECT doc_id + 1000000, text, lang, source, n_chars
FROM documents WHERE doc_id % 31 = 0
UNION ALL
SELECT doc_id + 2000000, text || ' zq extra near dup token',
       lang, source, n_chars
FROM documents WHERE doc_id % 17 = 0
"""

VEC_DUP_CORPUS_SQL = """
SELECT vec_id, embedding, label FROM embeddings
UNION ALL
SELECT vec_id + 100000, embedding, label
FROM embeddings WHERE vec_id % 29 = 0
UNION ALL
SELECT vec_id + 200000,
  [CAST(CAST(embedding[i] AS DOUBLE)
        * (1.0 + 0.001 * CAST((i * 37) % 13 - 6 AS DOUBLE)) AS FLOAT)
   FOR i IN generate_series(1, len(embedding))],
  label
FROM embeddings WHERE vec_id % 29 = 0
"""


def sql_norm_text(c: str) -> str:
    """Lowercased, whitespace-collapsed normalization (global flag!)."""
    return f"regexp_replace(lower({sql_ws_trim(c)}), '\\s+', ' ', 'g')"


def sql_dedup_exact() -> str:
    return f"""
WITH corpus AS ({NEAR_DUP_CORPUS_SQL})
SELECT md5({sql_norm_text('text')}) AS content_hash,
       min(doc_id) AS survivor_id,
       count(*) AS n_copies
FROM corpus GROUP BY 1"""


def _sql_shingles_cte(n: int = 3) -> str:
    """CTEs corpus -> sh(doc_id, shingles) with word n-gram shingles."""
    gram_concat = " || ' ' || ".join(f"words[i + {j}]" for j in range(n))
    wst = sql_ws_trim("lower(text)")
    return f"""
corpus AS ({NEAR_DUP_CORPUS_SQL}),
base AS (
  SELECT doc_id, {wst} AS lt,
         string_split_regex({wst}, '\\s+') AS words
  FROM corpus
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= {n}
         THEN list_distinct([{gram_concat}
                             FOR i IN generate_series(1, len(words) - {n - 1})])
         ELSE [lt] END AS shingles
  FROM base
)"""


def sql_doc_shingles_cte(n: int, src: str, prefix: str) -> str:
    """CTE pair ``{prefix}base -> {prefix}sh(doc_id, shingles)`` with
    word n-gram shingles over ``src`` (any table/CTE carrying doc_id +
    text) — the table-parameterized form of _sql_shingles_cte, twin of
    operators/dedup.py:word_shingles."""
    gram_concat = " || ' ' || ".join(f"words[i + {j}]" for j in range(n))
    wst = sql_ws_trim("lower(text)")
    return f"""
{prefix}base AS (
  SELECT doc_id, {wst} AS lt,
         string_split_regex({wst}, '\\s+') AS words
  FROM {src}
),
{prefix}sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= {n}
         THEN list_distinct([{gram_concat}
                             FOR i IN generate_series(1, len(words) - {n - 1})])
         ELSE [lt] END AS shingles
  FROM {prefix}base
)"""


def sql_bpe_token_count(c: str) -> str:
    """Twin of operators/text_analysis.py:bpe_token_count."""
    tok = TOKEN_REGEX.replace("'", "''")
    return f"len(regexp_extract_all(COALESCE({c}, ''), '{tok}'))"


def sql_minhash_lsh_pairs(threshold: float = 0.5) -> str:
    # window-family MinHash: one md5 per shingle, signature i = min of
    # the digest's 15-hex-char window at offset i (mirrors
    # operators/dedup.py:minhash_signature)
    sig_exprs = ", ".join(
        f"list_aggregate(list_transform(digests, h -> substr(h, {i + 1}, 15)), 'min')"
        for i in range(MINHASH_K)
    )
    band_exprs = []
    for b in range(LSH_BANDS):
        parts = " || '|' || ".join(
            f"sig[{b * LSH_ROWS_PER_BAND + r + 1}]"
            for r in range(LSH_ROWS_PER_BAND)
        )
        band_exprs.append(f"md5('{b}' || '|' || {parts})")
    bands_list = ", ".join(band_exprs)
    jac = (
        "CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) / "
        "CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE)"
    )
    return f"""
WITH {_sql_shingles_cte(3)},
dg AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> md5(s)) AS digests
  FROM sh
),
sigs AS (
  SELECT doc_id, shingles, [{sig_exprs}] AS sig FROM dg
),
banded AS (
  SELECT doc_id, shingles, unnest([{bands_list}]) AS band_key FROM sigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.shingles AS sh_a, b.shingles AS sh_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, {sql_stable_round(jac, 6)} AS jaccard
FROM cand
WHERE {sql_stable_round(jac, 6)} >= {threshold}"""


def _sql_simhash_cte() -> str:
    """CTE chain corpus -> sigs(doc_id, simhash) — shared by the
    signature table and the banded-pairs oracle."""
    wst = sql_ws_trim("lower(COALESCE(text, ''))")
    bits_of = (
        "[(CAST(floor((strpos('0123456789abcdef', "
        "substr(h, CAST(floor(j / 4) AS INT) + 1, 1)) - 1) "
        "/ pow(2.0, CAST(3 - (j % 4) AS DOUBLE))) AS INT) % 2) * 2 - 1 "
        "FOR j IN generate_series(0, 63)]"
    )
    return f"""
corpus AS ({NEAR_DUP_CORPUS_SQL}),
th AS (
  SELECT doc_id,
    list_transform(
      list_distinct(string_split_regex({wst}, '\\s+')),
      t -> md5(t)) AS hs
  FROM corpus
),
sums AS (
  SELECT doc_id,
    list_reduce(
      list_prepend([0 FOR j IN generate_series(0, 63)],
                   list_transform(hs, h -> {bits_of})),
      (a, b) -> [a[i] + b[i] FOR i IN generate_series(1, 64)]) AS s
  FROM th
),
sigs AS (
  SELECT doc_id,
    list_aggregate([CASE WHEN x > 0 THEN '1' ELSE '0' END FOR x IN s],
                   'string_agg', '') AS simhash
  FROM sums
)"""


def sql_simhash() -> str:
    return f"WITH {_sql_simhash_cte()} SELECT doc_id, simhash FROM sigs"


def sql_simhash_pairs(max_hamming: int = 3) -> str:
    from .operators.dedup import SIMHASH_CHUNK_BITS

    n_chunks = 64 // SIMHASH_CHUNK_BITS
    chunks = ", ".join(
        f"'{i}:' || substr(simhash, {i * SIMHASH_CHUNK_BITS + 1}, {SIMHASH_CHUNK_BITS})"
        for i in range(n_chunks)
    )
    ham = "CAST(bit_count(xor(CAST(sh_a AS BIT), CAST(sh_b AS BIT))) AS INT)"
    return f"""
WITH {_sql_simhash_cte()},
banded AS (
  SELECT doc_id, simhash, unnest([{chunks}]) AS band_key FROM sigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, {ham} AS hamming
FROM cand WHERE {ham} <= {max_hamming}"""


def sql_dedup_clusters(threshold: float = 0.5) -> str:
    """Connected components over the minhash near-dup pairs via a
    recursive CTE: full reachability closure, then min reachable id
    per node — the declarative twin of the iterative min-label
    propagation in operators/dedup.py:dedup_clusters."""
    pairs = sql_minhash_lsh_pairs(threshold)
    # reuse the pair query's CTE chain inside a recursive WITH: strip
    # its leading "WITH" and wrap its final SELECT as another CTE
    body = pairs.strip()
    assert body.startswith("WITH")
    cte_chain, final_select = body[len("WITH"):].rsplit(")\nSELECT", 1)
    return f"""
WITH RECURSIVE {cte_chain}),
pairs AS (SELECT{final_select}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r AS r
  FROM edges e JOIN reach ON e.b = reach.node
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node"""


def sql_ngram_jaccard_pairs(n: int = 2, threshold: float = 0.3) -> str:
    gram_concat = " || ' ' || ".join(f"words[i + {j}]" for j in range(n))
    wst = sql_ws_trim("lower(text)")
    jac = (
        "CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
        "CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)"
    )
    return f"""
WITH corpus AS ({NEAR_DUP_CORPUS_SQL}),
base AS (
  SELECT doc_id, source AS block, {wst} AS lt,
         string_split_regex({wst}, '\\s+') AS words
  FROM corpus
),
g AS (
  SELECT doc_id, block,
    CASE WHEN len(words) >= {n}
         THEN list_distinct([{gram_concat}
                             FOR i IN generate_series(1, len(words) - {n - 1})])
         ELSE [lt] END AS grams
  FROM base
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.block AS block,
       {sql_stable_round(jac, 6)} AS jaccard
FROM g a JOIN g b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE {sql_stable_round(jac, 6)} >= {threshold}"""


def sql_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_reduce([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"FOR i IN generate_series(1, {dim})], (x, y) -> x + y)"
    )


def sql_cosine(a: str, b: str, dim: int = 64) -> str:
    return (
        f"({sql_dot(a, b, dim)} / "
        f"sqrt({sql_dot(a, a, dim)} * {sql_dot(b, b, dim)}))"
    )


def sql_ann_topk(k: int = 5, dim: int = 64) -> str:
    sim = sql_cosine("cv", "qv", dim)
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {sim} AS sim
  FROM c CROSS JOIN q WHERE neighbor_id != query_id
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id,
       {sql_stable_round('sim', 6)} AS cosine_sim
FROM r WHERE rank <= {k}"""


def sql_quantize(vec: str, dim: int = 64) -> str:
    """Twin of operators/similarity.py:quantize_embedding (symmetric
    int8, per-vector max-abs scale, zero vector -> zeros)."""
    ma = f"CAST(list_max(list_transform({vec}, x -> abs(x))) AS DOUBLE)"
    q = (
        f"[CAST(floor(CAST({vec}[i] AS DOUBLE) * 127.0 / {ma} + 0.5) "
        f"AS INTEGER) FOR i IN generate_series(1, {dim})]"
    )
    zeros = f"[0 FOR i IN generate_series(1, {dim})]"
    return f"(CASE WHEN {ma} > 0 THEN {q} ELSE {zeros} END)"


def sql_idot(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_reduce([CAST({a}[i] AS BIGINT) * {b}[i] "
        f"FOR i IN generate_series(1, {dim})], (x, y) -> x + y)"
    )


def sql_ann_quantized_topk(
    k: int = 5, dim: int = 64, rerank_factor: int = 4
) -> str:
    m = k * rerank_factor
    daa = sql_idot("c_q", "c_q", dim)
    dbb = sql_idot("q_q", "q_q", dim)
    dot = sql_idot("c_q", "q_q", dim)
    qsim = (
        f"(CASE WHEN {daa} > 0 AND {dbb} > 0 THEN CAST({dot} AS DOUBLE) / "
        f"sqrt(CAST({daa} AS DOUBLE) * CAST({dbb} AS DOUBLE)) "
        f"ELSE -2.0 END)"
    )
    sim = sql_cosine("cv", "qv", dim)
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         {sql_quantize('embedding', dim)} AS q_q
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv,
         {sql_quantize('embedding', dim)} AS c_q
  FROM embeddings
),
stage1 AS (
  SELECT query_id, neighbor_id, {qsim} AS qsim
  FROM c CROSS JOIN q WHERE neighbor_id != query_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER
      (PARTITION BY query_id ORDER BY qsim DESC, neighbor_id ASC) AS qrank
    FROM stage1
  ) WHERE qrank <= {m}
),
exact AS (
  SELECT cand.query_id, cand.neighbor_id, {sim} AS sim
  FROM cand
  JOIN c ON c.neighbor_id = cand.neighbor_id
  JOIN q ON q.query_id = cand.query_id
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM exact
)
SELECT query_id, rank, neighbor_id,
       {sql_stable_round('sim', 6)} AS cosine_sim
FROM r WHERE rank <= {k}"""


def sql_bucket_expr(vec: str, dim: int = 64, n_planes: int = 8) -> str:
    bits = []
    for p in range(n_planes):
        plane = hyperplane(dim, p)
        terms = " + ".join(
            f"CAST({vec}[{j + 1}] AS DOUBLE) * {w!r}" for j, w in enumerate(plane)
        )
        bits.append(f"CASE WHEN ({terms}) > 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def sql_ann_lsh_topk(k: int = 5, dim: int = 64, n_planes: int = 8) -> str:
    sim = sql_cosine("cv", "qv", dim)
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         {sql_bucket_expr('embedding', dim, n_planes)} AS bucket
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv,
         {sql_bucket_expr('embedding', dim, n_planes)} AS bucket
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id, {sim} AS sim
  FROM c JOIN q USING (bucket) WHERE neighbor_id != query_id
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id,
       {sql_stable_round('sim', 6)} AS cosine_sim
FROM r WHERE rank <= {k}"""


def sql_ann_ivf_topk(
    k: int = 5,
    dim: int = 64,
    centroid_mod: int = 40,
    nprobe: int = 2,
) -> str:
    """Mirrors operators/similarity.py:ivf_topk — deterministic
    coarse quantizer (vec_id % mod), nearest-centroid inverted lists,
    nprobe search."""
    assign_sim = sql_cosine("v.embedding", "c.cent_vec", dim)
    search_sim = sql_cosine("p.q_vec", "l.vec", dim)
    return f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cent_vec FROM embeddings
  WHERE vec_id % {centroid_mod} = 0
),
assigned AS (
  SELECT v.vec_id, v.embedding, c.centroid_id, {assign_sim} AS c_sim,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {assign_sim} DESC, c.centroid_id ASC)
           AS c_rank
  FROM embeddings v CROSS JOIN cent c
),
lists AS (
  SELECT vec_id AS neighbor_id, centroid_id, embedding AS vec
  FROM assigned WHERE c_rank = 1
),
probes AS (
  SELECT vec_id AS query_id, centroid_id, embedding AS q_vec
  FROM assigned WHERE vec_id % 100 = 0 AND c_rank <= {nprobe}
),
scored AS (
  SELECT p.query_id, l.neighbor_id, {search_sim} AS sim
  FROM lists l JOIN probes p USING (centroid_id)
  WHERE l.neighbor_id != p.query_id
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id,
       {sql_stable_round('sim', 6)} AS cosine_sim
FROM r WHERE rank <= {k}"""


def sql_embedding_neardup(tau: float = 0.99, dim: int = 64) -> str:
    sim = sql_cosine("a.embedding", "b.embedding", dim)
    return f"""
WITH corpus AS ({VEC_DUP_CORPUS_SQL})
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS block,
       {sql_stable_round(sim, 6)} AS cosine_sim
FROM corpus a JOIN corpus b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {sim} >= {tau}"""


def sql_stopword_ratio(c: str) -> str:
    """Twin of operators/text_analysis.py:stopword_ratio."""
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    wst_lower = sql_ws_trim(f"lower(COALESCE({c}, ''))")
    words = f"string_split_regex({wst_lower}, '\\s+')"
    return (
        f"(CASE WHEN {c} IS NULL OR len({sql_ws_trim(c)}) = 0 THEN 0.0 "
        f"ELSE CAST(len(list_filter({words}, "
        f"w -> list_contains([{stop_list}], w))) AS DOUBLE) "
        f"/ CAST(len({words}) AS DOUBLE) END)"
    )


def sql_quality_score(c: str) -> str:
    """Twin of operators/text_analysis.py:text_quality_score."""
    sw_ratio = sql_stopword_ratio(c)
    n = f"COALESCE(len({c}), 0)"
    len_score = (
        f"(CASE WHEN {n} >= 200 AND {n} <= 8000 THEN 1.0 "
        f"WHEN {n} < 200 THEN CAST({n} AS DOUBLE) / 200.0 "
        f"ELSE 8000.0 / CAST({n} AS DOUBLE) END)"
    )
    sw_score = f"(CASE WHEN {sw_ratio} >= 0.05 THEN 1.0 ELSE {sw_ratio} / 0.05 END)"
    punct = rc(f"COALESCE({c}, '')", r"[^A-Za-z0-9\s]")
    punct_ratio = (
        f"(CASE WHEN {n} = 0 THEN 0.0 ELSE CAST({punct} AS DOUBLE) / {n} END)"
    )
    punct_score = (
        f"(CASE WHEN {punct_ratio} <= 0.1 THEN 1.0 "
        f"ELSE greatest(0.0, 1.0 - ({punct_ratio} - 0.1) * 2.0) END)"
    )
    digits = rc(f"COALESCE({c}, '')", "[0-9]")
    digit_ratio = (
        f"(CASE WHEN {n} = 0 THEN 0.0 ELSE CAST({digits} AS DOUBLE) / {n} END)"
    )
    digit_score = (
        f"(CASE WHEN {digit_ratio} <= 0.2 THEN 1.0 "
        f"ELSE greatest(0.0, 1.0 - ({digit_ratio} - 0.2) * 2.0) END)"
    )
    return sql_stable_round(
        f"0.4 * {len_score} + 0.2 * {sw_score} + 0.2 * {punct_score} "
        f"+ 0.2 * {digit_score}",
        4,
    )


def sql_text_analysis() -> str:
    tok = TOKEN_REGEX.replace("'", "''")
    wst_t = sql_ws_trim("text")
    norm = sql_norm_text("text")
    sw_ratio = sql_stopword_ratio("text")
    quality = sql_quality_score("text")
    winnow = (
        f"list_aggregate([md5(substr({norm}, i, 8)) "
        f"FOR i IN generate_series(1, greatest(1, len({norm}) - 7))], 'min')"
    )
    return f"""
SELECT doc_id,
  (CASE WHEN text IS NULL OR len({wst_t}) = 0 THEN 0
        ELSE len(string_split_regex({wst_t}, '\\s+')) END) AS ws_tokens,
  len(regexp_extract_all(COALESCE(text, ''), '{tok}')) AS bpe_tokens,
  md5({norm}) AS fingerprint,
  {winnow} AS winnow_fp,
  {sql_stable_round(sw_ratio, 6)} AS stopword_ratio,
  {quality} AS quality_score
FROM documents"""


# ---------------- deterministic sampling ----------------

def _sql_hash_bucket(key_expr: str, n_buckets: int = 10_000) -> str:
    """DuckDB twin of operators/sampling.py:hash_bucket."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )


def sql_stratified_sample(
    rates: dict[str, float], default_rate: float
) -> str:
    whens = " ".join(
        f"WHEN '{v}' THEN {int(r * 10_000)}" for v, r in sorted(rates.items())
    )
    return f"""
SELECT doc_id, source FROM documents
WHERE {_sql_hash_bucket('doc_id')}
      < CASE source {whens} ELSE {int(default_rate * 10_000)} END"""


def sql_train_test_split(weights: dict[str, float]) -> str:
    names = list(weights)
    whens, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        whens.append(
            f"WHEN {_sql_hash_bucket('doc_id')} < {int(round(cum * 10_000))} "
            f"THEN '{name}'"
        )
    case = " ".join(whens)
    return f"""
SELECT doc_id, CASE {case} ELSE '{names[-1]}' END AS split FROM documents"""


def sql_class_capped_sample(cap: int) -> str:
    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_sql_hash_bucket('doc_id')}, doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {cap}"""


# ---------------- explicit HLL sketch ----------------

_HLL_RHO_CASE = """CASE WHEN len(stripped) = 0 THEN 25
     ELSE (6 - len(stripped)) * 4
          + CASE substr(stripped, 1, 1)
              WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
              WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
              WHEN '7' THEN 1 ELSE 0 END
          + 1 END"""

_HLL_REGISTERS_CTE = f"""h AS (
  SELECT md5(CAST(event_id AS VARCHAR)) AS h FROM events
),
parts AS (
  SELECT ('0x' || substr(h, 1, 2))::INTEGER AS bucket,
         regexp_replace(substr(h, 3, 6), '^0+', '') AS stripped
  FROM h
),
regs AS (
  SELECT bucket, max(CAST({_HLL_RHO_CASE} AS INTEGER)) AS max_rho
  FROM parts GROUP BY bucket
)"""


def sql_hll_registers() -> str:
    """Twin of operators/sketches.py:hll_registers over events."""
    return f"""
WITH {_HLL_REGISTERS_CTE}
SELECT bucket, max_rho FROM regs"""


def sql_hll_estimate() -> str:
    # alpha * 256 * 256 precomputed: scaling by powers of two is exact
    # in double, so this equals Spark's (alpha * 256) * 256 bit-for-bit;
    # the float literal also keeps DuckDB out of DECIMAL arithmetic
    from .operators.sketches import HLL_BUCKETS, _linear_counting_lut

    m = HLL_BUCKETS
    scale = (0.7213 / (1.0 + 1.079 / m)) * m * m
    raw = (
        f"(CAST({scale!r} AS DOUBLE) / "
        f"(sum(pow(2.0, -max_rho)) + ({m} - count(*))))"
    )
    v = f"CAST({m} - count(*) AS INTEGER)"
    # identical double constants as the engine's literal array — list
    # extract is 1-based on both sides
    lut = "[" + ", ".join(f"{x!r}" for x in _linear_counting_lut()) + "]"
    est = (
        f"CASE WHEN {raw} <= {2.5 * m!r} AND {v} > 0 "
        f"THEN ({lut})[{v}] ELSE {raw} END"
    )
    return f"""
WITH {_HLL_REGISTERS_CTE}
SELECT {sql_stable_round(est, 2)} AS hll_estimate FROM regs"""


# ---------------- count-min sketch ----------------

_CMS_TOKENS_CTE = """toks AS (
  SELECT unnest(string_split_regex(
    regexp_replace(regexp_replace(COALESCE(lower(text), ''), '^\\s+', ''),
                   '\\s+$', ''),
    '\\s+')) AS term
  FROM documents
),
t AS (SELECT term FROM toks WHERE len(term) > 0),
salts AS (SELECT unnest([0, 1, 2, 3]) AS salt),
fan AS (
  SELECT salt,
         ('0x' || substr(md5(CAST(salt AS VARCHAR) || ':' || term), 1, 3))::INTEGER AS bucket
  FROM t CROSS JOIN salts
),
counters AS (
  SELECT salt, bucket, count(*) AS cnt FROM fan GROUP BY salt, bucket
)"""


def sql_cms_counters() -> str:
    """Twin of operators/sketches.py:cms_counters over document
    tokens (lowercased, ws_trim-tokenized like the Spark side)."""
    return f"""
WITH {_CMS_TOKENS_CTE}
SELECT salt, bucket, cnt FROM counters"""


def sql_cms_heavy_hitters(k: int = 20) -> str:
    return f"""
WITH {_CMS_TOKENS_CTE},
terms AS (SELECT DISTINCT term FROM t),
probes AS (
  SELECT term, salt,
         ('0x' || substr(md5(CAST(salt AS VARCHAR) || ':' || term), 1, 3))::INTEGER AS bucket
  FROM terms CROSS JOIN salts
),
est AS (
  SELECT term, min(cnt) AS est_count
  FROM probes JOIN counters USING (salt, bucket)
  GROUP BY term
)
SELECT term, est_count FROM est
ORDER BY est_count DESC, term
LIMIT {k}"""


def sql_pps_sample(scale: float) -> str:
    """Twin of operators/sampling.py:pps_sample over documents
    weighted by n_chars."""
    return f"""
SELECT doc_id, n_chars FROM documents
WHERE {_sql_hash_bucket('doc_id')}
      < floor(least(1.0, CAST(n_chars AS DOUBLE) / {float(scale)!r}) * 10000)"""


def sql_ann_lsh_multiprobe_topk(
    k: int = 5, dim: int = 64, n_planes: int = 8
) -> str:
    """Twin of operators/similarity.py:lsh_multiprobe_topk — the query
    bucket plus every hamming-1 flip, then the same bucket equi-join."""
    sim = sql_cosine("cv", "qv", dim)
    flips = ["qb"]
    for i in range(n_planes):
        flips.append(
            f"substr(qb, 1, {i}) || "
            f"(CASE WHEN substr(qb, {i + 1}, 1) = '1' THEN '0' ELSE '1' END)"
            f" || substr(qb, {i + 2}, {n_planes - i - 1})"
        )
    probe_list = ", ".join(flips)
    return f"""
WITH q0 AS (
  SELECT vec_id AS query_id, embedding AS qv,
         {sql_bucket_expr('embedding', dim, n_planes)} AS qb
  FROM embeddings WHERE vec_id % 100 = 0
),
q AS (
  SELECT query_id, qv, unnest([{probe_list}]) AS bucket FROM q0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv,
         {sql_bucket_expr('embedding', dim, n_planes)} AS bucket
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id, {sim} AS sim
  FROM c JOIN q USING (bucket) WHERE neighbor_id != query_id
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id,
       {sql_stable_round('sim', 6)} AS cosine_sim
FROM r WHERE rank <= {k}"""


def sql_dedup_corpus_prune(threshold: float = 0.5) -> str:
    """End-to-end dedup twin: cluster non-survivors removed from the
    synthetic corpus, kept counts per source. The recursive-CTE
    cluster query runs as a derived table."""
    clusters = sql_dedup_clusters(threshold)
    return f"""
WITH corpus AS ({NEAR_DUP_CORPUS_SQL}),
losers AS (
  SELECT doc_id FROM ({clusters}) WHERE doc_id != cluster_id
)
SELECT source, count(*) AS n_kept
FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
GROUP BY source"""


# ---------------- corpus quality (Gopher/C4 rules) ----------------

def _sql_cq_base(src: str = "documents") -> str:
    """CTE ``cqbase``: normalized text, word array, trimmed non-empty
    line array — twin of operators/corpus_quality.py:norm_words/_lines."""
    norm = sql_norm_text("text")
    return f"""
cqbase AS (
  SELECT doc_id, text, {norm} AS norm,
    CASE WHEN len({norm}) = 0 THEN CAST([] AS VARCHAR[])
         ELSE str_split({norm}, ' ') END AS words,
    list_filter(list_transform(str_split(COALESCE(text, ''), chr(10)),
                               l -> trim(l)),
                l -> len(l) > 0) AS lines
  FROM {src}
)"""


def _sql_frac(num: str, den: str, scale: int = 4) -> str:
    """Twin of corpus_quality._frac: guarded ratio, stable-rounded."""
    return sql_stable_round(
        f"(CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) ELSE 0.0 END)",
        scale,
    )


def sql_gopher_quality() -> str:
    """Twin of operators/corpus_quality.py:gopher_quality."""
    from .operators import corpus_quality as CQ

    wc = "len(words)"
    nl = "len(lines)"
    word_chars = f"(CASE WHEN {wc} > 0 THEN len(norm) - ({wc} - 1) ELSE 0 END)"
    mean_wl = sql_stable_round(
        f"(CASE WHEN {wc} > 0 THEN CAST({word_chars} AS DOUBLE) / {wc} ELSE 0.0 END)",
        4,
    )
    symbols = rc("COALESCE(text, '')", CQ.SYMBOL_REGEX)
    bullet = f"len(list_filter(lines, l -> regexp_matches(l, '{CQ.BULLET_LINE_REGEX}')))"
    ellipsis = f"len(list_filter(lines, l -> regexp_matches(l, '{CQ.ELLIPSIS_LINE_REGEX}')))"
    alpha = "len(list_filter(words, w -> regexp_matches(w, '[a-z]')))"
    req = ", ".join(f"'{w}'" for w in CQ.GOPHER_REQUIRED_WORDS)
    hits = f"len(list_intersect(list_distinct(words), [{req}]))"
    return f"""
WITH {_sql_cq_base()},
m AS (
  SELECT doc_id,
    CAST({wc} AS INTEGER) AS word_count,
    {mean_wl} AS mean_word_len,
    {_sql_frac(symbols, wc)} AS symbol_word_ratio,
    {_sql_frac(bullet, nl)} AS bullet_line_frac,
    {_sql_frac(ellipsis, nl)} AS ellipsis_line_frac,
    {_sql_frac(alpha, wc)} AS alpha_word_frac,
    CAST({hits} AS INTEGER) AS required_word_hits
  FROM cqbase
)
SELECT *,
  (word_count BETWEEN {CQ.GOPHER_MIN_WORDS} AND {CQ.GOPHER_MAX_WORDS}
   AND mean_word_len BETWEEN {CQ.GOPHER_MIN_MEAN_WORD_LEN} AND {CQ.GOPHER_MAX_MEAN_WORD_LEN}
   AND symbol_word_ratio <= {CQ.GOPHER_MAX_SYMBOL_WORD_RATIO}
   AND bullet_line_frac <= {CQ.GOPHER_MAX_BULLET_LINE_FRAC}
   AND ellipsis_line_frac <= {CQ.GOPHER_MAX_ELLIPSIS_LINE_FRAC}
   AND alpha_word_frac >= {CQ.GOPHER_MIN_ALPHA_WORD_FRAC}
   AND required_word_hits >= {CQ.GOPHER_MIN_REQUIRED_HITS}) AS passes_gopher
FROM m"""


def sql_repetition_profile() -> str:
    """Twin of operators/corpus_quality.py:repetition_profile."""
    from .operators import corpus_quality as CQ

    all_ns = sorted({*CQ.TOP_GRAM_NS, CQ.DUP_GRAM_N})
    gram_ctes = []
    for n in all_ns:
        gram_concat = " || ' ' || ".join(
            f"words[i + {j}]" for j in range(n)
        )
        gram_ctes.append(
            f"""SELECT doc_id, {n} AS n,
  unnest([{gram_concat} FOR i IN generate_series(1, len(words) - {n - 1})]) AS gram
FROM cqbase WHERE len(words) >= {n}"""
        )
    grams_union = "\nUNION ALL\n".join(gram_ctes)
    dup_line_chars = (
        "COALESCE(list_sum([CASE WHEN len(list_filter(lines, x -> x = d)) > 1 "
        "THEN len(list_filter(lines, x -> x = d)) * len(d) ELSE 0 END "
        "FOR d IN list_distinct(lines)]), 0)"
    )
    line_chars = "COALESCE(list_sum(list_transform(lines, l -> len(l))), 0)"
    top_cols = ",\n  ".join(
        _sql_frac(f"COALESCE(p.top{n}_chars, 0)", "d.total_chars")
        + f" AS top{n}gram_char_frac"
        for n in CQ.TOP_GRAM_NS
    )
    piv_cols = ",\n  ".join(
        f"max(CASE WHEN n = {n} THEN top_chars END) AS top{n}_chars"
        for n in CQ.TOP_GRAM_NS
    )
    return f"""
WITH {_sql_cq_base()},
per_doc AS (
  SELECT doc_id, len(norm) AS total_chars,
    {_sql_frac("len(words) - len(list_distinct(words))", "len(words)")} AS dup_word_frac,
    {_sql_frac("len(lines) - len(list_distinct(lines))", "len(lines)")} AS dup_line_frac,
    {_sql_frac(dup_line_chars, line_chars)} AS dup_line_char_frac
  FROM cqbase
),
grams AS (
{grams_union}
),
counted AS (
  SELECT doc_id, n, gram, count(*) AS cnt, count(*) * len(gram) AS chars
  FROM grams GROUP BY doc_id, n, gram
),
mc AS (
  SELECT *, max(cnt) OVER (PARTITION BY doc_id, n) AS mcnt FROM counted
),
per_n AS (
  SELECT doc_id, n,
    max(CASE WHEN cnt = mcnt THEN chars END) AS top_chars,
    sum(CASE WHEN cnt > 1 THEN chars ELSE 0 END) AS dup_chars
  FROM mc GROUP BY doc_id, n
),
piv AS (
  SELECT doc_id,
  {piv_cols},
  max(CASE WHEN n = {CQ.DUP_GRAM_N} THEN dup_chars END) AS dupn_chars
  FROM per_n GROUP BY doc_id
)
SELECT d.doc_id,
  d.dup_word_frac, d.dup_line_frac, d.dup_line_char_frac,
  {top_cols},
  {_sql_frac("COALESCE(p.dupn_chars, 0)", "d.total_chars")} AS dup{CQ.DUP_GRAM_N}gram_char_frac
FROM per_doc d LEFT JOIN piv p USING (doc_id)"""


def sql_chunk_documents() -> str:
    """Twin of operators/corpus_quality.py:chunk_documents."""
    from .operators import corpus_quality as CQ

    chunk, ov = CQ.CHUNK_TOKENS, CQ.CHUNK_OVERLAP
    step = chunk - ov
    return f"""
WITH {_sql_cq_base()},
st AS (
  SELECT doc_id, words, len(words) AS wc,
    unnest(generate_series(1, greatest(1, len(words) - {ov}), {step})) AS s
  FROM cqbase WHERE len(words) > 0
)
SELECT doc_id,
  CAST((s - 1) // {step} AS INTEGER) AS chunk_idx,
  CAST(s AS INTEGER) AS start_word,
  CAST(least({chunk}, wc - s + 1) AS INTEGER) AS n_tokens,
  array_to_string(list_slice(words, s, least(s + {chunk - 1}, wc)), ' ') AS chunk_text
FROM st"""


# ---------------- Bloom filter ----------------

BLOOM_BUILD_SQL = (
    "SELECT CAST(c_custkey AS VARCHAR) AS key FROM customer "
    "WHERE c_mktsegment = 'BUILDING'"
)


def _sql_bloom_word_bit(key: str, salt: int) -> tuple[str, str]:
    from .operators import sketches as SK

    h = f"md5('{salt}:' || {key})"
    word = f"(('0x' || substr({h}, 1, 2))::INTEGER % {SK.BLOOM_WORDS})"
    bit = f"(('0x' || substr({h}, 3, 2))::INTEGER % {SK.BLOOM_BITS_PER_WORD})"
    return word, f"CAST(pow(2, {bit}) AS BIGINT)"


def _sql_bloom_registers_cte() -> str:
    from .operators import sketches as SK

    arms = []
    for s in range(SK.BLOOM_K):
        word, mask = _sql_bloom_word_bit("key", s)
        arms.append(f"SELECT {word} AS word, {mask} AS mask FROM bkeys")
    fan = "\nUNION ALL\n".join(arms)
    return f"""
bkeys AS ({BLOOM_BUILD_SQL}),
bfan AS (
{fan}
),
bregs AS (
  SELECT word, bit_or(mask) AS bits FROM bfan GROUP BY word
)"""


def sql_bloom_registers() -> str:
    """Twin of operators/sketches.py:bloom_registers over the BUILDING
    customer keys."""
    return f"""
WITH {_sql_bloom_registers_cte()}
SELECT word, bits FROM bregs"""


def sql_bloom_probe() -> str:
    """Twin of operators/sketches.py:bloom_might_contain: every
    customer key probed against the BUILDING-segment filter."""
    from .operators import sketches as SK

    arms = []
    for s in range(SK.BLOOM_K):
        word, mask = _sql_bloom_word_bit("p.key", s)
        arms.append(
            f"SELECT p.c_custkey, {word} AS word, {mask} AS mask FROM probe p"
        )
    fan = "\nUNION ALL\n".join(arms)
    return f"""
WITH {_sql_bloom_registers_cte()},
probe AS (
  SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS key FROM customer
),
pfan AS (
{fan}
),
hit AS (
  SELECT f.c_custkey, (COALESCE(r.bits, 0) & f.mask) <> 0 AS ok
  FROM pfan f LEFT JOIN bregs r USING (word)
)
SELECT c_custkey, bool_and(ok) AS might_contain
FROM hit GROUP BY c_custkey"""


# ---------------- quality-aware cluster survivors ----------------

def sql_dedup_quality_prune(threshold: float = 0.5) -> str:
    """Twin of __spark_entry__.q_dedup_quality_prune: transitive
    near-dup clusters (recursive CTE) + highest-quality survivor per
    cluster (ties: lowest doc_id); unclustered docs survive as their
    own cluster."""
    clusters = sql_dedup_clusters(threshold)
    body = clusters.strip()
    assert body.startswith("WITH RECURSIVE")
    chain, final_select = body[len("WITH RECURSIVE"):].rsplit(
        "\nSELECT", 1
    )
    quality = sql_quality_score("text")
    return f"""
WITH RECURSIVE {chain},
clusters AS (SELECT{final_select}),
scored AS (
  SELECT doc_id, {quality} AS quality FROM corpus
),
labeled AS (
  SELECT s.doc_id, COALESCE(c.cluster_id, s.doc_id) AS cluster_id,
         s.quality
  FROM scored s LEFT JOIN clusters c USING (doc_id)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY quality DESC, doc_id ASC
  ) AS rn
  FROM labeled
)
SELECT doc_id, cluster_id, quality FROM ranked WHERE rn = 1"""


# ---------------- PII detection & redaction ----------------

def sql_pii_profile() -> str:
    """Twin of operators/pii.py:pii_profile over pii_corpus."""
    from .operators.pii import PII_PATTERNS, SQL_PII_CORPUS

    count_cols = ",\n  ".join(
        f"{rc('text', pat)} AS n_{name}" for name, pat, _ in PII_PATTERNS
    )
    total = " + ".join(rc("text", pat) for _, pat, _ in PII_PATTERNS)
    return f"""
WITH corpus AS ({SQL_PII_CORPUS})
SELECT doc_id,
  {count_cols},
  ({total}) AS n_pii,
  ({total}) > 0 AS has_pii
FROM corpus"""


def sql_pii_redact() -> str:
    """Twin of operators/pii.py:pii_redact: nested global
    regexp_replace in the fixed PII_PATTERNS category order (DuckDB
    needs the explicit 'g' flag; Spark replaces globally by default).
    """
    from .operators.pii import PII_PATTERNS, SQL_PII_CORPUS

    expr = "text"
    for _, pat, token in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{token}', 'g')"
    return f"""
WITH corpus AS ({SQL_PII_CORPUS})
SELECT doc_id, {expr} AS text
FROM corpus"""


# ---------------- random-projection compression ----------------

def sql_project_embeddings() -> str:
    """Twin of operators/similarity.py:project_embeddings — the same
    rp_matrix literals, each output dim an unrolled left-associated
    sum (matches F.aggregate's index-ordered fold bit-for-bit)."""
    from .operators.similarity import RP_IN_DIM, RP_OUT_DIM, rp_matrix

    mat = rp_matrix()
    arms = []
    for k in range(RP_OUT_DIM):
        terms = " + ".join(
            f"CAST(embedding[{j + 1}] AS DOUBLE) * {mat[k][j]!r}"
            for j in range(RP_IN_DIM)
        )
        arms.append(f"SELECT vec_id, {k} AS k, ({terms}) AS proj\nFROM embeddings")
    body = "\nUNION ALL\n".join(arms)
    return f"SELECT vec_id, k, proj FROM (\n{body}\n)"


# ---------------- semantic dedup ----------------

def sql_semantic_dedup(
    tau: float = 0.99, centroid_mod: int = 25, dim: int = 64
) -> str:
    """Twin of operators/similarity.py:semantic_dedup over the planted
    vec-dup corpus: nearest-centroid assignment (row_number with the
    same tie-break as the Spark argmax struct), then greedy min-id
    prune within the cluster."""
    assign_sim = sql_cosine("v.embedding", "c.cent_vec", dim)
    pair_sim = sql_cosine("a.vec", "b.vec", dim)
    return f"""
WITH corpus AS ({VEC_DUP_CORPUS_SQL}),
cent AS (
  SELECT vec_id AS centroid_id, embedding AS cent_vec FROM corpus
  WHERE vec_id % {centroid_mod} = 0
),
assigned AS (
  SELECT v.vec_id AS vid, v.embedding AS vec, c.centroid_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {assign_sim} DESC, c.centroid_id ASC)
           AS c_rank
  FROM corpus v CROSS JOIN cent c
),
lists AS (SELECT vid, vec, centroid_id FROM assigned WHERE c_rank = 1),
pruned AS (
  SELECT DISTINCT b.vid
  FROM lists a JOIN lists b
    ON a.centroid_id = b.centroid_id AND a.vid < b.vid
  WHERE {pair_sim} >= {tau}
)
SELECT s.vid AS vec_id, s.centroid_id, p.vid IS NULL AS kept
FROM lists s LEFT JOIN pruned p ON s.vid = p.vid"""


# ---------------- k-means (Lloyd) ----------------

def sql_kmeans_lloyd(
    k: int = 8, iters: int = 2, dim: int = 64
) -> str:
    """Twin of operators/clustering.py:kmeans_lloyd, iterations
    unrolled as CTE stages. All arithmetic is the same exact integer
    math (quantize + offset, integer round-half-up means), so
    assignments agree exactly; HUGEINT intermediates are cast back to
    BIGINT at every output edge."""
    from .operators.clustering import KMEANS_OFFSET, KMEANS_QS

    m = f"{float(10 ** KMEANS_QS)!r}"
    qvec = (
        f"[CAST(floor(CAST(embedding[i] AS DOUBLE) * {m} + 0.5) AS BIGINT)"
        f" + {KMEANS_OFFSET} FOR i IN generate_series(1, {dim})]"
    )

    def dist(a: str, b: str) -> str:
        return (
            f"list_reduce([({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) "
            f"FOR i IN generate_series(1, {dim})], (x, y) -> x + y)"
        )

    d = dist("b.qvec", "c.cvec")
    parts = [
        f"""base AS (
  SELECT vec_id AS vid, {qvec} AS qvec FROM embeddings
),
cent0 AS (SELECT vid AS cid, qvec AS cvec FROM base WHERE vid < {k})"""
    ]
    prev = "cent0"
    for it in range(1, iters + 1):
        parts.append(f"""a{it} AS (
  SELECT b.vid, b.qvec, c.cid, {d} AS dist,
         row_number() OVER (PARTITION BY b.vid
                            ORDER BY {d} ASC, c.cid ASC) AS rn
  FROM base b CROSS JOIN {prev} c
),
m{it} AS (SELECT vid, qvec, cid FROM a{it} WHERE rn = 1),
d{it} AS (
  SELECT cid, j,
         CAST((2 * sum(qvec[j]) + count(*)) // (2 * count(*)) AS BIGINT)
           AS cq
  FROM m{it} CROSS JOIN generate_series(1, {dim}) AS g(j)
  GROUP BY cid, j
),
cent{it} AS (SELECT cid, list(cq ORDER BY j) AS cvec FROM d{it} GROUP BY cid)""")
        prev = f"cent{it}"
    parts.append(f"""fin AS (
  SELECT b.vid, c.cid, {d} AS dist,
         row_number() OVER (PARTITION BY b.vid
                            ORDER BY {d} ASC, c.cid ASC) AS rn
  FROM base b CROSS JOIN {prev} c
)""")
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT vid AS vec_id, cid AS cluster_id, CAST(dist AS BIGINT) AS sq_dist
FROM fin WHERE rn = 1"""


# ---------------- hard-negative mining ----------------

def sql_hard_negatives(k: int = 5, dim: int = 64) -> str:
    """Twin of operators/similarity.py:hard_negatives."""
    sim = sql_cosine("cv", "qv", dim)
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS q_label
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id, n_label, {sim} AS sim
  FROM c CROSS JOIN q WHERE n_label != q_label
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, n_label AS neighbor_label,
       {sql_stable_round('sim', 6)} AS cosine_sim
FROM r WHERE rank <= {k}"""


# ---------------- hashed-n-gram quality classifier ----------------

def sql_quality_classifier() -> str:
    """Twin of operators/corpus_quality.py:quality_classifier."""
    from .operators import corpus_quality as CQ

    bucket = f"(('0x' || substr(md5(gram), 1, 8))::BIGINT % {CQ.QC_BUCKETS})"
    wq = f"((({bucket}) * {CQ._QC_MULT}) % {CQ.QC_WMOD}) - {CQ.QC_WOFF}"
    score = sql_stable_round(
        f"CAST(s AS DOUBLE) / (CAST(n_grams AS DOUBLE) * {float(CQ.QC_WOFF)!r})",
        6,
    )
    return f"""
WITH {_sql_cq_base()},
g AS (
  SELECT doc_id,
         unnest(list_concat(
           words,
           CASE WHEN len(words) >= 2
             THEN [words[i] || ' ' || words[i + 1]
                   FOR i IN generate_series(1, len(words) - 1)]
             ELSE CAST([] AS VARCHAR[]) END
         )) AS gram
  FROM cqbase
),
agg AS (
  SELECT doc_id, count(*) AS n_grams, CAST(sum({wq}) AS BIGINT) AS s
  FROM g GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       CASE WHEN COALESCE(a.n_grams, 0) = 0 THEN 0.0 ELSE {score} END
         AS qc_score,
       COALESCE(a.s, 0) > 0 AS qc_label
FROM cqbase c LEFT JOIN agg a USING (doc_id)"""


# ---------------- semantic decontamination ----------------

def sql_semantic_decontaminate(tau: float = 0.95, dim: int = 64) -> str:
    """Twin of operators/similarity.py:semantic_decontaminate with the
    benchmark set = vec_id % 100 = 0 (same harness split as ANN)."""
    sim = sql_cosine("c.embedding", "b.b_vec", dim)
    return f"""
WITH b AS (
  SELECT vec_id AS bench_id, embedding AS b_vec FROM embeddings
  WHERE vec_id % 100 = 0
),
scored AS (
  SELECT c.vec_id AS vid, max({sim}) AS max_sim
  FROM embeddings c CROSS JOIN b
  WHERE c.vec_id != b.bench_id
  GROUP BY c.vec_id
)
SELECT vid AS vec_id,
       {sql_stable_round('max_sim', 6)} AS max_benchmark_sim,
       max_sim >= {tau} AS contaminated
FROM scored"""


# ---------------- PageRank (fixed-point, bipartite) ----------------

def sql_pagerank_bipartite(iters: int = 3) -> str:
    """Twin of operators/graph.py:pagerank_bipartite — iterations
    unrolled as CTE stages. Identical integer arithmetic (SCALE
    10^12, truncating division on non-negative operands, 85/100
    damping), so ranks are BIGINT-exact across engines."""
    scale = 10**12
    parts = [
        f"""pairs AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS (
  SELECT node, deg,
         CAST({scale} // n_nodes AS BIGINT) AS r,
         CAST((15 * ({scale} // n_nodes)) // 100 AS BIGINT) AS tele
  FROM deg CROSS JOIN nn
)"""
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        parts.append(f"""inc{it} AS (
  SELECT e.dst AS node, CAST(sum(p.r // p.deg) AS BIGINT) AS inc
  FROM edges e JOIN {prev} p ON e.src = p.node
  GROUP BY e.dst
),
r{it} AS (
  SELECT p.node, p.deg,
         CAST(p.tele + (85 * COALESCE(i.inc, 0)) // 100 AS BIGINT) AS r,
         p.tele
  FROM {prev} p LEFT JOIN inc{it} i ON p.node = i.node
)""")
        prev = f"r{it}"
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(node // 2 AS BIGINT) AS node_key,
       r AS rank_fp
FROM {prev}"""


def sql_pagerank_weighted_bipartite(iters: int = 3) -> str:
    """Twin of operators/graph.py:pagerank_weighted_bipartite — pair
    MULTIPLICITY as the integer edge weight; per-edge contribution
    (r * w) // W_src with W_src = sum of outgoing weights. Identical
    fixed-point discipline as sql_pagerank_bipartite."""
    scale = 10**12
    parts = [
        f"""pairs AS (
  SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b,
         CAST(count(*) AS BIGINT) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT a AS src, b AS dst, w FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst, w FROM pairs
),
deg AS (
  SELECT src AS node, CAST(sum(w) AS BIGINT) AS deg
  FROM edges GROUP BY src
),
nn AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS (
  SELECT node, deg,
         CAST({scale} // n_nodes AS BIGINT) AS r,
         CAST((15 * ({scale} // n_nodes)) // 100 AS BIGINT) AS tele
  FROM deg CROSS JOIN nn
)"""
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        parts.append(f"""inc{it} AS (
  SELECT e.dst AS node, CAST(sum((p.r * e.w) // p.deg) AS BIGINT) AS inc
  FROM edges e JOIN {prev} p ON e.src = p.node
  GROUP BY e.dst
),
r{it} AS (
  SELECT p.node, p.deg,
         CAST(p.tele + (85 * COALESCE(i.inc, 0)) // 100 AS BIGINT) AS r,
         p.tele
  FROM {prev} p LEFT JOIN inc{it} i ON p.node = i.node
)""")
        prev = f"r{it}"
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(node // 2 AS BIGINT) AS node_key,
       r AS rank_fp
FROM {prev}"""


# ---------------- sketch compositions ----------------

def _hll_regs_cte_named(name: str, src: str, key: str) -> str:
    """Parameterized HLL register CTE chain ending in table ``name``
    (same derivation as _HLL_REGISTERS_CTE)."""
    return f"""{name}_h AS (
  SELECT md5(CAST({key} AS VARCHAR)) AS h FROM {src}
),
{name}_p AS (
  SELECT ('0x' || substr(h, 1, 2))::INTEGER AS bucket,
         regexp_replace(substr(h, 3, 6), '^0+', '') AS stripped
  FROM {name}_h
),
{name} AS (
  SELECT bucket, max(CAST({_HLL_RHO_CASE} AS INTEGER)) AS max_rho
  FROM {name}_p GROUP BY bucket
)"""


def _hll_est_select(regs: str) -> str:
    """Scalar HLL estimate (2-decimal stable round) over register
    table ``regs`` — same constants as sql_hll_estimate."""
    from .operators.sketches import HLL_BUCKETS, _linear_counting_lut

    m = HLL_BUCKETS
    scale = (0.7213 / (1.0 + 1.079 / m)) * m * m
    raw = (
        f"(CAST({scale!r} AS DOUBLE) / "
        f"(sum(pow(2.0, -max_rho)) + ({m} - count(*))))"
    )
    v = f"CAST({m} - count(*) AS INTEGER)"
    lut = "[" + ", ".join(f"{x!r}" for x in _linear_counting_lut()) + "]"
    est = (
        f"CASE WHEN {raw} <= {2.5 * m!r} AND {v} > 0 "
        f"THEN ({lut})[{v}] ELSE {raw} END"
    )
    return f"SELECT {sql_stable_round(est, 2)} AS e FROM {regs}"


def sql_hll_set_ops() -> str:
    """Twin of operators/sketches.py:hll_set_ops over click vs
    purchase user sets."""
    a = _hll_regs_cte_named(
        "areg",
        "(SELECT user_id FROM events WHERE event_type = 'click')",
        "user_id",
    )
    b = _hll_regs_cte_named(
        "breg",
        "(SELECT user_id FROM events WHERE event_type = 'purchase')",
        "user_id",
    )
    inter = "greatest(0.0, ea.e + eb.e - eu.e)"
    return f"""
WITH {a},
{b},
ureg AS (
  SELECT COALESCE(a.bucket, b.bucket) AS bucket,
         CAST(greatest(COALESCE(a.max_rho, 0), COALESCE(b.max_rho, 0))
              AS INTEGER) AS max_rho
  FROM areg a FULL OUTER JOIN breg b ON a.bucket = b.bucket
),
ea AS ({_hll_est_select('areg')}),
eb AS ({_hll_est_select('breg')}),
eu AS ({_hll_est_select('ureg')})
SELECT ea.e AS est_a, eb.e AS est_b, eu.e AS est_union,
       {sql_stable_round(inter, 2)} AS est_intersection
FROM ea CROSS JOIN eb CROSS JOIN eu"""


def sql_cms_join_size() -> str:
    """Twin of operators/sketches.py:cms_join_size — per-salt CMS
    inner product estimating |clicks JOIN purchases| on user_id."""
    bucket = (
        "('0x' || substr(md5(CAST(salt AS VARCHAR) || ':' || term), 1, 3))"
        "::INTEGER"
    )
    return f"""
WITH salts AS (SELECT unnest([0, 1, 2, 3]) AS salt),
l AS (SELECT CAST(user_id AS VARCHAR) AS term FROM events
      WHERE event_type = 'click'),
r AS (SELECT CAST(user_id AS VARCHAR) AS term FROM events
      WHERE event_type = 'purchase'),
lc AS (
  SELECT salt, {bucket} AS bucket, count(*) AS cnt
  FROM l CROSS JOIN salts GROUP BY 1, 2
),
rc AS (
  SELECT salt, {bucket} AS bucket, count(*) AS cnt
  FROM r CROSS JOIN salts GROUP BY 1, 2
),
dots AS (
  SELECT salt, CAST(sum(lc.cnt * rc.cnt) AS BIGINT) AS dot_product
  FROM lc JOIN rc USING (salt, bucket) GROUP BY salt
)
SELECT salt, dot_product,
       min(dot_product) OVER () AS est_join_size
FROM dots"""


def sql_hll_by_group() -> str:
    """Twin of sketches.hll_registers_by_group + hll_estimate_by_group
    over (event_type, user_id). The 2^-rho sums are dyadic rationals
    with <= 25 fractional bits over <= 256 terms — exact in double,
    hence order-independent on both engines."""
    from .operators.sketches import HLL_BUCKETS, _linear_counting_lut

    m = HLL_BUCKETS
    scale = (0.7213 / (1.0 + 1.079 / m)) * m * m
    raw = (
        f"(CAST({scale!r} AS DOUBLE) / "
        f"(sum(pow(2.0, -max_rho)) + ({m} - count(*))))"
    )
    v = f"CAST({m} - count(*) AS INTEGER)"
    lut = "[" + ", ".join(f"{x!r}" for x in _linear_counting_lut()) + "]"
    est = (
        f"CASE WHEN {raw} <= {2.5 * m!r} AND {v} > 0 "
        f"THEN ({lut})[{v}] ELSE {raw} END"
    )
    return f"""
WITH h AS (
  SELECT event_type AS g, md5(CAST(user_id AS VARCHAR)) AS h FROM events
),
parts AS (
  SELECT g, ('0x' || substr(h, 1, 2))::INTEGER AS bucket,
         regexp_replace(substr(h, 3, 6), '^0+', '') AS stripped
  FROM h
),
regs AS (
  SELECT g, bucket, max(CAST({_HLL_RHO_CASE} AS INTEGER)) AS max_rho
  FROM parts GROUP BY g, bucket
)
SELECT g, {sql_stable_round(est, 2)} AS hll_estimate
FROM regs GROUP BY g"""


def sql_personalized_pagerank_bipartite(
    seed_mod: int = 50, iters: int = 3
) -> str:
    """Twin of graph.personalized_pagerank_bipartite: same unrolled
    iterations as sql_pagerank_bipartite, but initial mass and
    teleport restricted to seed customers (c_custkey % seed_mod = 0)
    present in the graph. The seed test is anchored to the customer
    table via EXISTS — structurally matching Spark's seed derivation
    (a customer-table filter joined onto the graph's nodes) rather
    than assuming referential integrity of o_custkey."""
    scale = 10**12
    seed = (
        f"(node % 2 = 0 AND (node // 2) % {seed_mod} = 0"
        f" AND EXISTS (SELECT 1 FROM customer c"
        f" WHERE c.c_custkey = node // 2))"
    )
    parts = [
        f"""pairs AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
nn AS (
  SELECT count(*) FILTER (WHERE {seed}) AS n_base FROM deg
),
r0 AS (
  SELECT node, deg,
         CAST(CASE WHEN {seed} THEN {scale} // n_base
              ELSE 0 END AS BIGINT) AS r,
         CAST(CASE WHEN {seed}
              THEN (15 * ({scale} // n_base)) // 100
              ELSE 0 END AS BIGINT) AS tele
  FROM deg CROSS JOIN nn
)"""
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        parts.append(f"""inc{it} AS (
  SELECT e.dst AS node, CAST(sum(p.r // p.deg) AS BIGINT) AS inc
  FROM edges e JOIN {prev} p ON e.src = p.node
  GROUP BY e.dst
),
r{it} AS (
  SELECT p.node, p.deg,
         CAST(p.tele + (85 * COALESCE(i.inc, 0)) // 100 AS BIGINT) AS r,
         p.tele
  FROM {prev} p LEFT JOIN inc{it} i ON p.node = i.node
)""")
        prev = f"r{it}"
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(node // 2 AS BIGINT) AS node_key,
       r AS rank_fp
FROM {prev}"""


def _sql_uv_ctes(k: int, maxlen: int, max_word: int) -> str:
    """Shared CTE chain wf -> ... -> dp for the unigram-LM twins
    (caller must open with WITH RECURSIVE): identical piece inventory
    (every 1-gram + top-k multigrams, count DESC piece ASC), identical
    dyadic weights and (score*256 - pieces) pack. The Viterbi DP is
    derived via a RECURSIVE CTE over end positions (bounded at
    max_word iterations) instead of a fold: the 4-slot rotation reads
    every accumulator field before rewriting any, which is circular
    under list_reduce's in-place mutation — values identical,
    mechanism declared divergent (see unigram_word_stats).

    Hot nodes are AS MATERIALIZED (round-10, VERDICT r9 #3): DuckDB
    inlines plain CTEs per reference, so the em_scores chain — which
    re-reads cand/vocab/pw through the path-recovery AND round-2
    blocks — re-executed them multiplicatively (20.2 s -> 0.1 s at
    sf0.001). Execution hint only; values identical."""
    neg = -1_000_000_000
    pack = 256
    words = _sql_bpe_words("char").format(ids="")
    return f"""wf AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS f FROM ({words}
  GROUP BY w
),
shortw AS MATERIALIZED (SELECT w, f FROM wf WHERE length(w) <= {max_word}),
cand AS MATERIALIZED (
  SELECT w, i, l,
         substr(w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece
  FROM (
    SELECT w, i,
           unnest(generate_series(1, least({maxlen}, length(w) - i + 1)))
             AS l
    FROM (SELECT w, unnest(generate_series(1, length(w))) AS i
          FROM shortw)
  )
),
gramcnt AS MATERIALIZED (
  SELECT c.piece, CAST(sum(s.f) AS BIGINT) AS cnt
  FROM cand c JOIN shortw s USING (w) GROUP BY c.piece
),
vocab AS MATERIALIZED (
  SELECT piece, cnt FROM gramcnt WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM gramcnt WHERE length(piece) >= 2
    ORDER BY cnt DESC, piece LIMIT {k}
  )
),
vq AS (SELECT piece, CAST(length(bin(cnt)) AS BIGINT) AS q FROM vocab),
qq AS (
  SELECT CAST(length(bin(CAST(sum(cnt) AS BIGINT))) AS BIGINT) AS qc
  FROM vocab
),
pw AS MATERIALIZED (
  SELECT c.w, c.i + c.l - 1 AS e, c.l,
         CASE WHEN v.q IS NOT NULL
              THEN (v.q - qq.qc) * {pack} - 1
              ELSE CAST({neg} AS BIGINT) END AS p
  FROM cand c LEFT JOIN vq v USING (piece) CROSS JOIN qq
),
byend AS MATERIALIZED (
  SELECT w, e,
         coalesce(max(CASE WHEN l = 1 THEN p END),
                  CAST({neg} AS BIGINT)) AS p1,
         coalesce(max(CASE WHEN l = 2 THEN p END),
                  CAST({neg} AS BIGINT)) AS p2,
         coalesce(max(CASE WHEN l = 3 THEN p END),
                  CAST({neg} AS BIGINT)) AS p3,
         coalesce(max(CASE WHEN l = 4 THEN p END),
                  CAST({neg} AS BIGINT)) AS p4
  FROM pw GROUP BY w, e
),
dp AS (
  SELECT w, CAST(0 AS BIGINT) AS e,
         CAST({neg} AS BIGINT) AS d1, CAST({neg} AS BIGINT) AS d2,
         CAST({neg} AS BIGINT) AS d3, CAST(0 AS BIGINT) AS d4,
         CAST(length(w) AS BIGINT) AS len
  FROM shortw
  UNION ALL
  SELECT dp.w, dp.e + 1, dp.d2, dp.d3, dp.d4,
         greatest(dp.d4 + b.p1, dp.d3 + b.p2,
                  dp.d2 + b.p3, dp.d1 + b.p4),
         dp.len
  FROM dp JOIN byend b ON b.w = dp.w AND b.e = dp.e + 1
  WHERE dp.e < dp.len
)"""


def sql_unigram_lm_scores(
    k: int = 256, maxlen: int = 4, max_word: int = 32
) -> str:
    """Twin of tokenizer.unigram_lm_scores over the shared _sql_uv_ctes
    DP chain; see that helper for the declared mechanism divergence."""
    neg = -1_000_000_000
    pack = 256
    dw = _sql_bpe_words("char").format(ids="doc_id,")
    return f"""
WITH RECURSIVE {_sql_uv_ctes(k, maxlen, max_word)},
seg0 AS (SELECT w, d4 AS packed FROM dp WHERE e = len),
seg AS (
  SELECT w,
         CAST({pack} - ((packed % {pack}) + {pack}) % {pack}
              AS BIGINT) AS n_pieces,
         CAST((packed + ({pack} - ((packed % {pack}) + {pack})
                         % {pack})) // {pack} AS BIGINT) AS lm_score_q,
         false AS is_long
  FROM seg0
  UNION ALL
  SELECT w, CAST(1 AS BIGINT), CAST(0 AS BIGINT), true
  FROM wf WHERE length(w) > {max_word}
),
dw AS (
  SELECT doc_id, w FROM ({dw}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(CASE WHEN is_long THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long_words,
       CAST(sum(lm_score_q) AS BIGINT) AS lm_score_q
FROM dw JOIN seg USING (w)
GROUP BY doc_id"""


def _sql_uv_path_ctes() -> str:
    """CTEs dpfull -> pick -> bt -> usage: argmax recovery as a
    NON-recursive self-join (dpfull at e and e-l; l on the path iff
    dp[e] = dp[e-l] + p, ties to max(l) — the same deterministic rule
    as Spark's pick table), the backtrace as a second RECURSIVE CTE
    walking e from length(w) to 0 emitting one piece per step, and
    usage = sum of word frequencies over the emitted pieces. Shared
    by the em_refine and em_scores twins."""
    return """dpfull AS MATERIALIZED (SELECT w, e, d4 AS dp FROM dp),
pick AS MATERIALIZED (
  SELECT p.w, p.e, max(p.l) AS lp
  FROM pw p
  JOIN dpfull de ON de.w = p.w AND de.e = p.e
  JOIN dpfull dl ON dl.w = p.w AND dl.e = p.e - p.l
  WHERE de.dp = dl.dp + p.p
  GROUP BY p.w, p.e
),
bt AS (
  SELECT w, CAST(length(w) AS BIGINT) AS e,
         CAST(NULL AS VARCHAR) AS piece
  FROM shortw
  UNION ALL
  SELECT bt.w, bt.e - pk.lp,
         substr(bt.w, CAST(bt.e - pk.lp + 1 AS INTEGER),
                CAST(pk.lp AS INTEGER))
  FROM bt JOIN pick pk ON pk.w = bt.w AND pk.e = bt.e
  WHERE bt.e > 0
),
usage AS MATERIALIZED (
  SELECT b.piece, CAST(sum(s.f) AS BIGINT) AS vit_cnt
  FROM bt b JOIN shortw s USING (w)
  WHERE b.piece IS NOT NULL
  GROUP BY b.piece
)"""


def sql_unigram_em_refine(
    k: int = 256, maxlen: int = 4, max_word: int = 32, min_cnt: int = 1
) -> str:
    """Twin of tokenizer.unigram_em_refine: the shared _sql_uv_ctes
    forward DP + _sql_uv_path_ctes recovery; prune verdict and dyadic
    re-quantization mirror the operator exactly."""
    return f"""
WITH RECURSIVE {_sql_uv_ctes(k, maxlen, max_word)},
{_sql_uv_path_ctes()}
SELECT v.piece,
       CAST(length(v.piece) AS BIGINT) AS plen,
       v.cnt AS cnt0,
       vq.q AS q0,
       CAST(coalesce(u.vit_cnt, 0) AS BIGINT) AS vit_cnt,
       CASE WHEN coalesce(u.vit_cnt, 0) > 0
            THEN CAST(length(bin(coalesce(u.vit_cnt, 0))) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS q_new,
       (length(v.piece) = 1 OR coalesce(u.vit_cnt, 0) >= {min_cnt})
         AS kept
FROM vocab v
JOIN vq USING (piece)
LEFT JOIN usage u ON u.piece = v.piece"""


def _sql_uv_round_ctes(
    r: int, maxlen: int, min_cnt: int, vocab_body: str | None = None
) -> str:
    """Round-``r`` (r >= 2) CTE blocks for the unigram-EM loop twin:
    vocab{r} = the kept pieces of round r-1 with re-quantized dyadic
    weights, then the full forward DP (pw{r}/byend{r}/dp{r}) and path
    recovery (dpfull{r}/pick{r}/bt{r}/usage{r}) — the identical
    mechanics as the round-1 chain in _sql_uv_ctes/_sql_uv_path_ctes
    with suffixed names, chained off the previous round's
    vocab/usage. DuckDB allows several recursive CTEs under one
    WITH RECURSIVE (the em_scores twin already runs three).
    ``vocab_body`` overrides the vocab{r} SELECT (the schedule twin
    prunes by rank toward a target size instead of a usage floor)."""
    neg = -1_000_000_000
    pack = 256
    sfx = "" if r == 2 else str(r - 1)
    prev_vocab, prev_usage = f"vocab{sfx}", f"usage{sfx}"
    pcols = ",\n         ".join(
        f"coalesce(max(CASE WHEN l = {n} THEN p END),\n"
        f"                  CAST({neg} AS BIGINT)) AS p{n}"
        for n in range(1, maxlen + 1)
    )
    greatest = ", ".join(
        f"dp{r}.d{4 - n + 1} + b.p{n}" for n in range(1, maxlen + 1)
    )
    if vocab_body is None:
        vocab_body = f"""SELECT v.piece, CAST(coalesce(u.vit_cnt, 0) AS BIGINT) AS cnt,
         CASE WHEN coalesce(u.vit_cnt, 0) > 0
              THEN CAST(length(bin(coalesce(u.vit_cnt, 0))) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS q
  FROM {prev_vocab} v LEFT JOIN {prev_usage} u USING (piece)
  WHERE length(v.piece) = 1 OR coalesce(u.vit_cnt, 0) >= {min_cnt}"""
    return f"""vocab{r} AS MATERIALIZED (
  {vocab_body}
),
qq{r} AS (
  SELECT CAST(length(bin(CAST(sum(cnt) AS BIGINT))) AS BIGINT) AS qc
  FROM vocab{r}
),
pw{r} AS MATERIALIZED (
  SELECT c.w, c.i + c.l - 1 AS e, c.l,
         CASE WHEN v.q IS NOT NULL
              THEN (v.q - qq{r}.qc) * {pack} - 1
              ELSE CAST({neg} AS BIGINT) END AS p
  FROM cand c
  LEFT JOIN (SELECT piece, q FROM vocab{r}) v USING (piece)
  CROSS JOIN qq{r}
),
byend{r} AS (
  SELECT w, e,
         {pcols}
  FROM pw{r} GROUP BY w, e
),
dp{r} AS (
  SELECT w, CAST(0 AS BIGINT) AS e,
         CAST({neg} AS BIGINT) AS d1, CAST({neg} AS BIGINT) AS d2,
         CAST({neg} AS BIGINT) AS d3, CAST(0 AS BIGINT) AS d4,
         CAST(length(w) AS BIGINT) AS len
  FROM shortw
  UNION ALL
  SELECT dp{r}.w, dp{r}.e + 1, dp{r}.d2, dp{r}.d3, dp{r}.d4,
         greatest({greatest}),
         dp{r}.len
  FROM dp{r} JOIN byend{r} b ON b.w = dp{r}.w AND b.e = dp{r}.e + 1
  WHERE dp{r}.e < dp{r}.len
),
dpfull{r} AS MATERIALIZED (SELECT w, e, d4 AS dp FROM dp{r}),
pick{r} AS (
  SELECT p.w, p.e, max(p.l) AS lp
  FROM pw{r} p
  JOIN dpfull{r} de ON de.w = p.w AND de.e = p.e
  JOIN dpfull{r} dl ON dl.w = p.w AND dl.e = p.e - p.l
  WHERE de.dp = dl.dp + p.p
  GROUP BY p.w, p.e
),
bt{r} AS (
  SELECT w, CAST(length(w) AS BIGINT) AS e,
         CAST(NULL AS VARCHAR) AS piece
  FROM shortw
  UNION ALL
  SELECT bt{r}.w, bt{r}.e - pk.lp,
         substr(bt{r}.w, CAST(bt{r}.e - pk.lp + 1 AS INTEGER),
                CAST(pk.lp AS INTEGER))
  FROM bt{r} JOIN pick{r} pk ON pk.w = bt{r}.w AND pk.e = bt{r}.e
  WHERE bt{r}.e > 0
),
usage{r} AS MATERIALIZED (
  SELECT b.piece, CAST(sum(s.f) AS BIGINT) AS vit_cnt
  FROM bt{r} b JOIN shortw s USING (w)
  WHERE b.piece IS NOT NULL
  GROUP BY b.piece
)"""


def _sql_uv_round_summary(r: int, min_cnt: int) -> str:
    """SELECT block of round-``r``'s inventory-delta row for the EM
    loop twin — vocab{sfx}/usage{sfx} are the inventory ENTERING the
    round and the Viterbi usage it produced."""
    sfx = "" if r == 1 else str(r)
    return f"""SELECT CAST({r} AS BIGINT) AS round,
       CAST(count(*) AS BIGINT) AS n_pieces,
       CAST(sum(CASE WHEN plen >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
         AS n_pruned,
       CAST(sum(vit_cnt) AS BIGINT) AS vit_total,
       CAST(sum(CASE WHEN kept THEN q_new ELSE 0 END) AS BIGINT)
         AS q_mass
FROM (
  SELECT length(v.piece) AS plen,
         coalesce(u.vit_cnt, 0) AS vit_cnt,
         CASE WHEN coalesce(u.vit_cnt, 0) > 0
              THEN length(bin(coalesce(u.vit_cnt, 0)))
              ELSE 0 END AS q_new,
         (length(v.piece) = 1 OR coalesce(u.vit_cnt, 0) >= {min_cnt})
           AS kept
  FROM vocab{sfx} v LEFT JOIN usage{sfx} u USING (piece)
)"""


def sql_unigram_em_loop(
    k: int = 256,
    maxlen: int = 4,
    max_word: int = 32,
    min_cnt: int = 1,
    rounds: int = 3,
) -> str:
    """Twin of tokenizer.unigram_em_loop — the full SentencePiece
    trainer loop: ``rounds`` chained estimate-then-prune passes, each
    a complete forward-DP + path-recovery CTE block (round 1 reuses
    the shared _sql_uv_ctes/_sql_uv_path_ctes chain; rounds >= 2 come
    from _sql_uv_round_ctes), emitting one inventory-delta row per
    round."""
    blocks = [
        _sql_uv_ctes(k, maxlen, max_word),
        _sql_uv_path_ctes(),
    ]
    for r in range(2, rounds + 1):
        blocks.append(_sql_uv_round_ctes(r, maxlen, min_cnt))
    union = "\nUNION ALL\n".join(
        _sql_uv_round_summary(r, min_cnt) for r in range(1, rounds + 1)
    )
    joined = ",\n".join(blocks)
    return f"""
WITH RECURSIVE {joined}
{union}"""


def _sql_uvsched_block(
    r: int, target: int, num: int, den: int
) -> str:
    """Schedule-prune CTE blocks for round ``r`` of the size-scheduled
    trainer twin: base{r} (inventory + usage + re-quantized weight),
    tgt{r} (n_target = max(target, ceil(n_multi * num/den)) over the
    multigrams ENTERING the round), refined{r} (singles always kept;
    multigrams kept iff usage > 0 and (usage DESC, piece ASC) rank
    within n_target). base{r}/refined{r} MATERIALIZED — each is read
    by the summary, the rank subquery, and the next round's vocab."""
    sfx = "" if r == 1 else str(r)
    return f"""base{r} AS MATERIALIZED (
  SELECT v.piece, CAST(length(v.piece) AS BIGINT) AS plen,
         CAST(coalesce(u.vit_cnt, 0) AS BIGINT) AS vit_cnt,
         CASE WHEN coalesce(u.vit_cnt, 0) > 0
              THEN CAST(length(bin(coalesce(u.vit_cnt, 0))) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS q_new
  FROM vocab{sfx} v LEFT JOIN usage{sfx} u USING (piece)
),
tgt{r} AS (
  SELECT greatest(CAST({target} AS BIGINT),
                  ({num} * count(*) + {den - 1}) // {den}) AS n_target
  FROM base{r} WHERE plen >= 2
),
refined{r} AS MATERIALIZED (
  SELECT piece, plen, vit_cnt, q_new,
         CAST(n_target AS BIGINT) AS n_target, true AS kept
  FROM base{r} CROSS JOIN tgt{r} WHERE plen = 1
  UNION ALL
  SELECT piece, plen, vit_cnt, q_new, CAST(n_target AS BIGINT),
         (vit_cnt > 0 AND rk <= n_target) AS kept
  FROM (
    SELECT piece, plen, vit_cnt, q_new,
           row_number() OVER (ORDER BY vit_cnt DESC, piece) AS rk
    FROM base{r} WHERE plen >= 2
  ) CROSS JOIN tgt{r}
)"""


def _sql_uvsched_summary(r: int) -> str:
    """Round-``r`` delta row of the schedule twin, read off
    refined{r}."""
    return f"""SELECT CAST({r} AS BIGINT) AS round,
       CAST(count(*) AS BIGINT) AS n_pieces,
       CAST(sum(CASE WHEN plen >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi,
       CAST(max(n_target) AS BIGINT) AS n_target,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
         AS n_pruned,
       CAST(sum(vit_cnt) AS BIGINT) AS vit_total,
       CAST(sum(CASE WHEN kept THEN q_new ELSE 0 END) AS BIGINT)
         AS q_mass
FROM refined{r}"""


def sql_unigram_em_schedule(
    k: int = 256,
    maxlen: int = 4,
    max_word: int = 32,
    rounds: int = 3,
    target: int = 64,
    num: int = 3,
    den: int = 4,
) -> str:
    """Twin of tokenizer.unigram_em_schedule — the size-scheduled
    trainer: round 1 reuses the shared _sql_uv_ctes/_sql_uv_path_ctes
    chain; each later round's vocab{r} reads refined{r-1}'s kept
    pieces (rank-pruned toward the target) and runs the full DP/path
    blocks from _sql_uv_round_ctes with the schedule's vocab body."""
    blocks = [
        _sql_uv_ctes(k, maxlen, max_word),
        _sql_uv_path_ctes(),
        _sql_uvsched_block(1, target, num, den),
    ]
    for r in range(2, rounds + 1):
        vb = (
            "SELECT piece, CAST(vit_cnt AS BIGINT) AS cnt,\n"
            "         CAST(q_new AS BIGINT) AS q\n"
            f"  FROM refined{r - 1} WHERE kept"
        )
        blocks.append(_sql_uv_round_ctes(r, maxlen, 0, vocab_body=vb))
        blocks.append(_sql_uvsched_block(r, target, num, den))
    union = "\nUNION ALL\n".join(
        _sql_uvsched_summary(r) for r in range(1, rounds + 1)
    )
    joined = ",\n".join(blocks)
    return f"""
WITH RECURSIVE {joined}
{union}"""


def _sql_uv_scores_tail(dp: str, max_word: int = 32) -> str:
    """The seg0/seg/dw + per-doc rollup tail shared by the
    unigram-scores twins, parameterized on the final DP CTE name
    (dp2 for the min-cnt round-2 chain, dp{R+1} for the scheduled
    chain). Long words (> max_word) mirror the [UNK] discipline."""
    pack = 256
    dw = _sql_bpe_words("char").format(ids="doc_id,")
    return f"""seg0 AS (SELECT w, d4 AS packed FROM {dp} WHERE e = len),
seg AS (
  SELECT w,
         CAST({pack} - ((packed % {pack}) + {pack}) % {pack}
              AS BIGINT) AS n_pieces,
         CAST((packed + ({pack} - ((packed % {pack}) + {pack})
                         % {pack})) // {pack} AS BIGINT) AS lm_score_q,
         false AS is_long
  FROM seg0
  UNION ALL
  SELECT w, CAST(1 AS BIGINT), CAST(0 AS BIGINT), true
  FROM wf WHERE length(w) > {max_word}
),
dw AS (
  SELECT doc_id, w FROM ({dw}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(CASE WHEN is_long THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long_words,
       CAST(sum(lm_score_q) AS BIGINT) AS lm_score_q
FROM dw JOIN seg USING (w)
GROUP BY doc_id"""


def sql_unigram_em_schedule_scores(
    k: int = 256,
    maxlen: int = 4,
    max_word: int = 32,
    rounds: int = 3,
    target: int = 64,
    num: int = 3,
    den: int = 4,
) -> str:
    """Twin of tokenizer.unigram_em_schedule_scores: the schedule
    twin's chained blocks through refined{rounds}, one more full DP
    block (round rounds+1) whose vocab is the FINAL kept inventory,
    and the shared per-doc rollup tail over its dp. The unreferenced
    path-recovery CTEs of the final block are never evaluated."""
    blocks = [
        _sql_uv_ctes(k, maxlen, max_word),
        _sql_uv_path_ctes(),
        _sql_uvsched_block(1, target, num, den),
    ]
    for r in range(2, rounds + 1):
        vb = (
            "SELECT piece, CAST(vit_cnt AS BIGINT) AS cnt,\n"
            "         CAST(q_new AS BIGINT) AS q\n"
            f"  FROM refined{r - 1} WHERE kept"
        )
        blocks.append(_sql_uv_round_ctes(r, maxlen, 0, vocab_body=vb))
        blocks.append(_sql_uvsched_block(r, target, num, den))
    final = rounds + 1
    vb = (
        "SELECT piece, CAST(vit_cnt AS BIGINT) AS cnt,\n"
        "         CAST(q_new AS BIGINT) AS q\n"
        f"  FROM refined{rounds} WHERE kept"
    )
    blocks.append(_sql_uv_round_ctes(final, maxlen, 0, vocab_body=vb))
    blocks.append(_sql_uv_scores_tail(f"dp{final}", max_word))
    joined = ",\n".join(blocks)
    return f"""
WITH RECURSIVE {joined}"""


def sql_unigram_em_scores(
    k: int = 256, maxlen: int = 4, max_word: int = 32, min_cnt: int = 1
) -> str:
    """Twin of tokenizer.unigram_em_scores — EM round 2's E-step: the
    refined inventory (kept pieces, usage counts, re-quantized
    weights) feeds a SECOND full DP chain (pw2/byend2/dp2, same
    mechanics as round 1 with vq2/qq2), and the per-doc rollup is
    the SHARED _sql_uv_scores_tail over dp2 (ADVICE r10 — one copy
    of the twin tail, same text the schedule-scores twin chains)."""
    neg = -1_000_000_000
    pack = 256
    return f"""
WITH RECURSIVE {_sql_uv_ctes(k, maxlen, max_word)},
{_sql_uv_path_ctes()},
vocab2 AS MATERIALIZED (
  SELECT v.piece, CAST(coalesce(u.vit_cnt, 0) AS BIGINT) AS cnt
  FROM vocab v LEFT JOIN usage u ON u.piece = v.piece
  WHERE length(v.piece) = 1 OR coalesce(u.vit_cnt, 0) >= {min_cnt}
),
vq2 AS (
  SELECT piece,
         CASE WHEN cnt > 0 THEN CAST(length(bin(cnt)) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS q
  FROM vocab2
),
qq2 AS (
  SELECT CAST(length(bin(CAST(sum(cnt) AS BIGINT))) AS BIGINT) AS qc
  FROM vocab2
),
pw2 AS MATERIALIZED (
  SELECT c.w, c.i + c.l - 1 AS e, c.l,
         CASE WHEN v.q IS NOT NULL
              THEN (v.q - qq2.qc) * {pack} - 1
              ELSE CAST({neg} AS BIGINT) END AS p
  FROM cand c LEFT JOIN vq2 v USING (piece) CROSS JOIN qq2
),
byend2 AS MATERIALIZED (
  SELECT w, e,
         coalesce(max(CASE WHEN l = 1 THEN p END),
                  CAST({neg} AS BIGINT)) AS p1,
         coalesce(max(CASE WHEN l = 2 THEN p END),
                  CAST({neg} AS BIGINT)) AS p2,
         coalesce(max(CASE WHEN l = 3 THEN p END),
                  CAST({neg} AS BIGINT)) AS p3,
         coalesce(max(CASE WHEN l = 4 THEN p END),
                  CAST({neg} AS BIGINT)) AS p4
  FROM pw2 GROUP BY w, e
),
dp2 AS (
  SELECT w, CAST(0 AS BIGINT) AS e,
         CAST({neg} AS BIGINT) AS d1, CAST({neg} AS BIGINT) AS d2,
         CAST({neg} AS BIGINT) AS d3, CAST(0 AS BIGINT) AS d4,
         CAST(length(w) AS BIGINT) AS len
  FROM shortw
  UNION ALL
  SELECT dp2.w, dp2.e + 1, dp2.d2, dp2.d3, dp2.d4,
         greatest(dp2.d4 + b.p1, dp2.d3 + b.p2,
                  dp2.d2 + b.p3, dp2.d1 + b.p4),
         dp2.len
  FROM dp2 JOIN byend2 b ON b.w = dp2.w AND b.e = dp2.e + 1
  WHERE dp2.e < dp2.len
),
{_sql_uv_scores_tail('dp2', max_word)}"""


def _sql_bpe_words(alphabet: str, src: str = "documents") -> str:
    """Word extraction under the alphabet's rules (twin of
    tokenizer._doc_words): char = lowercased ASCII-alpha gate;
    bytes = raw whitespace tokens, no case folding. ``src`` picks the
    corpus table/CTE (default the raw documents table; the BPE
    token-space dedup twin trains on its near-dup corpus CTE)."""
    if alphabet == "char":
        tmpl = """
    SELECT {ids} unnest(string_split_regex(
      regexp_replace(regexp_replace(lower(COALESCE(text, '')),
                                    '^\\s+', ''), '\\s+$', ''),
      '\\s+')) AS w
    FROM documents
  ) WHERE regexp_matches(w, '^[a-z]+$')"""
    else:
        tmpl = """
    SELECT {ids} unnest(string_split_regex(
      regexp_replace(regexp_replace(COALESCE(text, ''),
                                    '^\\s+', ''), '\\s+$', ''),
      '\\s+')) AS w
    FROM documents
  ) WHERE w <> ''"""
    return tmpl.replace("FROM documents", f"FROM {src}")


def _sql_bpe_cte(
    n_merges: int = 4, alphabet: str = "char", src: str = "documents"
) -> str:
    """Shared CTE chain for the BPE twins: wf -> vocab0 ->
    (pc{k}, best{k}, ... vocab{k+1}) x n_merges. ``bytes`` segments
    words into uppercase hex pairs of the UTF-8 bytes (hex(encode(w))
    is identical across engines — the pinned byte<->int map)."""
    seg = (
        "string_split(w, '')"
        if alphabet == "char"
        else "regexp_extract_all(hex(encode(w)), '..')"
    )
    words = _sql_bpe_words(alphabet, src).format(ids="")
    parts = [
        f"""wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS f FROM ({words}
  GROUP BY w
),
vocab0 AS (SELECT w, f, {seg} AS toks FROM wf)"""
    ]
    for k in range(n_merges):
        parts.append(f"""pc{k} AS (
  SELECT toks[i] AS l, toks[i + 1] AS r,
         CAST(sum(f) AS BIGINT) AS pair_count
  FROM (SELECT f, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM vocab{k} WHERE len(toks) >= 2)
  GROUP BY 1, 2
),
best{k} AS (
  SELECT {k} AS merge_rank, l, r, pair_count
  FROM pc{k} ORDER BY pair_count DESC, l, r LIMIT 1
),
pos{k} AS (
  SELECT w, f, i, toks[i] AS tok,
         CASE WHEN i < len(toks) THEN toks[i + 1] END AS nxt
  FROM (SELECT w, f, toks,
               unnest(generate_series(1, len(toks))) AS i
        FROM vocab{k})
),
mt{k} AS (
  SELECT p.w, p.f, p.i, p.tok, p.nxt,
         (p.tok = b.l AND p.nxt = b.r) AS mt
  FROM pos{k} p CROSS JOIN best{k} b
),
isl{k} AS (
  SELECT *, CASE WHEN mt THEN i - row_number() OVER
      (PARTITION BY w, mt ORDER BY i) END AS island
  FROM mt{k}
),
val{k} AS (
  SELECT *, mt AND ((i - min(i) OVER (PARTITION BY w, island)) % 2 = 0)
      AS vld
  FROM isl{k}
),
em{k} AS (
  SELECT w, f, i,
         CASE WHEN vld THEN tok || nxt ELSE tok END AS tok,
         COALESCE(lag(vld) OVER (PARTITION BY w ORDER BY i), false)
             AS cons
  FROM val{k}
),
vocab{k + 1} AS (
  SELECT w, f, list(tok ORDER BY i) AS toks
  FROM em{k} WHERE NOT cons GROUP BY w, f
)""")
    return ",\n".join(parts)


def sql_bpe_train(n_merges: int = 4, alphabet: str = "char") -> str:
    """Twin of operators/tokenizer.py:bpe_train — merge iterations
    unrolled as CTE stages. Same pinned argmax order
    (count DESC, left, right) and the same even-offset-in-run greedy
    application via gaps-and-islands windows. NOTE: the engine side
    short-circuits when pair counts run dry (tokenizer.bpe_learn);
    the unrolled twin assumes n_merges productive iterations, which
    holds on any corpus whose pair table survives n_merges rounds
    (trivially true at fixture scale — the engine's short-circuit is
    covered by pytest on a degenerate corpus instead)."""
    union = "\nUNION ALL\n".join(
        f'SELECT merge_rank, l AS "left", r AS "right", pair_count '
        f"FROM best{k}"
        for k in range(n_merges)
    )
    return f"""
WITH {_sql_bpe_cte(n_merges, alphabet)}
{union}"""


def sql_bpe_token_counts(n_merges: int = 4, alphabet: str = "char") -> str:
    """Twin of tokenizer.bpe_token_counts: per-doc word count and
    total token count under the learned segmentation."""
    dw = _sql_bpe_words(alphabet).format(ids="doc_id,")
    return f"""
WITH {_sql_bpe_cte(n_merges, alphabet)},
sizes AS (
  SELECT w, len(toks) AS nt FROM vocab{n_merges}
),
dw AS (
  SELECT doc_id, w FROM ({dw}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN sizes USING (w)
GROUP BY doc_id"""


def _cosupply_edges_cte(k: int = 8, part_cap: int = 32) -> str:
    """Shared CTE chain ending in ``edges`` — the mutual-kNN
    co-supply graph, mirroring operators/graph.py:cosupply_edges
    (deterministic md5-ranked per-part supplier cap, integer
    shared-part ranking with id tie-break, top-k per supplier,
    mutual check, canonical u < v)."""
    return f"""ps0 AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ps AS (
  SELECT l_partkey, l_suppkey FROM (
    SELECT l_partkey, l_suppkey, row_number() OVER (
      PARTITION BY l_partkey
      ORDER BY md5(CAST(l_partkey AS VARCHAR) || '|' ||
                   CAST(l_suppkey AS VARCHAR)), l_suppkey) AS pr
    FROM ps0)
  WHERE pr <= {part_cap}),
pairs AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS shared
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2),
ranked AS (
  SELECT u, v, row_number() OVER
    (PARTITION BY u ORDER BY shared DESC, v ASC) AS rnk
  FROM pairs),
knn AS (SELECT u, v FROM ranked WHERE rnk <= {k}),
edges AS (
  SELECT x.u, x.v FROM knn x JOIN knn y
    ON x.u = y.v AND x.v = y.u
  WHERE x.u < x.v)"""


_COSUPPLY_TRI_CTES = """tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)"""


def sql_cosupply_triangles() -> str:
    """Twin of operators/graph.py:cosupply_triangles — mutual-kNN
    edges (shared CTE) + the canonical a < b < c wedge-close, so
    per-node counts are exact integers in both engines."""
    return f"""
WITH {_cosupply_edges_cte()},
{_COSUPPLY_TRI_CTES}
SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node"""


def sql_bipartite_bfs_levels(
    seed_mod: int = 100, max_level: int = 4
) -> str:
    """Twin of operators/graph.py:bipartite_bfs_levels — the bounded
    walk as a recursive CTE, min(level) per node = BFS hop distance.
    UNION dedups (node, level) pairs and the level bound terminates
    the recursion; min over the walk set is order-independent, so the
    engines agree exactly."""
    return f"""
WITH RECURSIVE prs AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM prs
  UNION ALL
  SELECT b AS src, a AS dst FROM prs
),
seeds AS (
  SELECT c_custkey * 2 AS node FROM customer
  WHERE c_custkey % {seed_mod} = 0
),
walk(node, level) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.level + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.level < {max_level}
)
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       CAST(node // 2 AS BIGINT) AS node_key,
       CAST(min(level) AS INTEGER) AS level
FROM walk GROUP BY node"""


def _winnow_sel_cte(k: int, w: int) -> str:
    """Shared CTE chain ending in ``sel`` — the DISTINCT
    (doc_id, fp_hash) winnowing selection, identical packed argmin
    (h * 2^20 + (2^20 - pos)) and window frame as
    operators/dedup.py:winnowing_fp_set."""
    radix = 1 << 20
    return f"""d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) >= {k + w - 1}
),
g AS (
  SELECT doc_id, n, text,
         unnest(generate_series(1, n - {k - 1})) AS pos
  FROM d
),
packed AS (
  SELECT doc_id, n, pos,
         ('0x' || substr(md5(substr(text, pos, {k})), 1, 8))::BIGINT
           * {radix} + ({radix} - pos) AS ck
  FROM g
),
mw AS (
  SELECT doc_id, n, pos,
         min(ck) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
         ) AS mck
  FROM packed
),
sel AS (
  SELECT DISTINCT doc_id,
         CAST(mck // {radix} AS BIGINT) AS fp_hash
  FROM mw WHERE pos <= n - {k - 1} - {w - 1}
)"""


def sql_winnowing_fingerprints(k: int = 8, w: int = 4) -> str:
    """Twin of operators/dedup.py:winnowing_fingerprints — per-doc
    summary over the shared winnowing selection CTE."""
    return f"""
WITH {_winnow_sel_cte(k, w)}
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_fp,
       CAST(sum(fp_hash) AS BIGINT) AS fp_checksum,
       min(fp_hash) AS fp_min,
       max(fp_hash) AS fp_max
FROM sel GROUP BY doc_id"""


def sql_winnow_neardup_pairs(
    k: int = 8, w: int = 4, max_df: int = 64
) -> str:
    """Twin of operators/dedup.py:winnow_neardup_pairs — same
    document-frequency cap and integer overlap-coefficient threshold
    (4 * shared >= least(n_a, n_b))."""
    return f"""
WITH {_winnow_sel_cte(k, w)},
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
  FROM sel GROUP BY doc_id
),
rare AS (
  SELECT fp_hash FROM sel GROUP BY fp_hash
  HAVING count(*) <= {max_df}
),
kept AS (SELECT s.* FROM sel s JOIN rare USING (fp_hash)),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS shared_fp
  FROM kept a JOIN kept b
    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b, s.shared_fp,
       na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b
FROM shared s
JOIN sizes na ON na.doc_id = s.doc_a
JOIN sizes nb ON nb.doc_id = s.doc_b
WHERE 4 * s.shared_fp >= least(na.n_fp, nb.n_fp)"""


def sql_salted_skew_join() -> str:
    """Twin of operators/relational.py:salted_skew_join —
    deliberately the PLAIN fact-to-dim join: the salted two-phase
    plan must be row-identical to the unsalted join, differing only
    in partitioning."""
    return """
WITH dim AS (
  SELECT user_id, min(ts) AS first_seen,
         CAST(count(*) AS BIGINT) AS lifetime_events
  FROM events GROUP BY user_id
)
SELECT e.user_id, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       min(d.first_seen) AS first_seen,
       CAST(min(d.lifetime_events) AS BIGINT) AS lifetime_events
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.user_id, e.event_type"""


def sql_cms_topk_stream(k: int = 10) -> str:
    """Twin of __spark_entry__.q_cms_topk_stream — the same CMS build
    (depth 4, 3-hex-char buckets) over stringified event user ids,
    batch-equivalent because counter sums are associative, then the
    min-over-depth top-k readout."""
    return f"""
WITH salts AS (SELECT unnest(generate_series(0, 3)) AS salt),
t AS (SELECT CAST(user_id AS VARCHAR) AS term FROM events),
f AS (
  SELECT salt,
         ('0x' || substr(md5(CAST(salt AS VARCHAR) || ':' || term), 1, 3))::INTEGER AS bucket
  FROM t CROSS JOIN salts
),
counters AS (
  SELECT salt, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM f GROUP BY salt, bucket
),
terms AS (SELECT DISTINCT term FROM t),
probes AS (
  SELECT term, salt,
         ('0x' || substr(md5(CAST(salt AS VARCHAR) || ':' || term), 1, 3))::INTEGER AS bucket
  FROM terms CROSS JOIN salts
),
est AS (
  SELECT term, CAST(min(cnt) AS BIGINT) AS est_count
  FROM probes JOIN counters USING (salt, bucket)
  GROUP BY term
)
SELECT term, est_count FROM est
ORDER BY est_count DESC, term
LIMIT {k}"""


def sql_cosupply_clustering() -> str:
    """Twin of operators/graph.py:cosupply_clustering — mutual-kNN
    edge + triangle CTEs shared with sql_cosupply_triangles, plus
    node degree and the 2T/(d(d-1)) coefficient (one IEEE division
    over exact integers, stable-rounded on both sides)."""
    cc = sql_stable_round(
        "CASE WHEN nd.degree >= 2 THEN"
        " (2.0 * COALESCE(tc.n_triangles, 0))"
        " / (nd.degree * (nd.degree - 1)) ELSE 0.0 END",
        6,
    )
    return f"""
WITH {_cosupply_edges_cte()},
{_COSUPPLY_TRI_CTES},
tcounts AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM corners GROUP BY node),
ndeg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM edges
    UNION ALL SELECT v FROM edges
  ) GROUP BY node)
SELECT nd.node AS s_suppkey, nd.degree,
       CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
       {cc} AS clustering_coef
FROM ndeg nd LEFT JOIN tcounts tc ON nd.node = tc.node"""


def sql_session_window_stream(
    gap_min: int = 30, wm_min: int = 10, strict: bool = True
) -> str:
    """Twin of __spark_entry__.q_session_window_stream — native
    session_window semantics: windows merge while the next event
    starts AT OR BEFORE the current end (touching windows merge —
    verified by test_native_session_window_gap_boundary — so a new
    session starts iff the inter-event gap is STRICTLY > 30 min,
    same boundary rule as the custom sessionizer), session end is
    last event + gap, and append mode emits sessions whose end (ms)
    fell below the final watermark (max event time ms - delay)."""
    gap_us = gap_min * 60 * 1_000_000
    cmp = "<" if strict else "<="
    return f"""
WITH e AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS prev_ts
  FROM events
),
s AS (
  SELECT *, sum(CASE WHEN prev_ts IS NULL
                      OR date_diff('microsecond', prev_ts, ts)
                         > {gap_us}
                THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS session_seq
  FROM e
),
wm AS (
  SELECT (max(epoch_us(ts)) // 1000) - {wm_min * 60 * 1000} AS wm_ms
  FROM events
),
sess AS (
  SELECT user_id, session_seq,
    min(ts) AS session_start,
    max(ts) + INTERVAL {gap_min} MINUTE AS session_end,
    CAST(count(*) AS BIGINT) AS n_events,
    {sql_stable_round('sum(value)', 2)} AS session_value
  FROM s GROUP BY user_id, session_seq
)
SELECT user_id, session_start, session_end, n_events, session_value
FROM sess
WHERE (epoch_us(session_end) // 1000) {cmp} (SELECT wm_ms FROM wm)"""


def sql_bigram_lift(min_count: int = 5, k: int = 20) -> str:
    """Twin of operators/text_analysis.py:bigram_lift — identical
    tokenization, occurrence (not document) counts, and the same
    single BIGINT-product division."""
    wst = sql_ws_trim("lower(text)")
    lift = sql_stable_round(
        "CAST(t.n * b.cxy AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE)", 6
    )
    return f"""
WITH base AS (
  SELECT string_split_regex({wst}, '\\s+') AS words FROM documents
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(words) AS w FROM base) GROUP BY w
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT words[i] AS w1, words[i + 1] AS w2
  FROM base, unnest(generate_series(1, len(words) - 1)) AS g(i)
  WHERE len(words) >= 2
),
bcnt AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy
  FROM bg GROUP BY w1, w2 HAVING count(*) >= {min_count}
)
SELECT b.w1 || ' ' || b.w2 AS bigram,
       b.cxy AS pair_count,
       {lift} AS lift
FROM bcnt b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN tot t
ORDER BY lift DESC, bigram ASC
LIMIT {k}"""


def _fp_arm(table: str, exprs: list[str]) -> str:
    enc = ",\n      ".join(
        f"COALESCE(CAST({e} AS VARCHAR), chr(0))" for e in exprs
    )
    return f"""SELECT '{table}' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(sum(('0x' || substr(md5(concat_ws('|',
      {enc})), 1, 8))::BIGINT), 0) % {1 << 61} AS BIGINT) AS checksum
FROM {table}"""


def sql_table_fingerprints() -> str:
    """Twin of __spark_entry__.q_table_fingerprints — identical
    null-tagged encodings (epoch micros, quantized doubles) and the
    same mod-2^61 hash sum (HUGEINT-exact here, DECIMAL(38,0)-exact
    on the Spark side)."""
    def qz(e: str) -> str:
        # scalar quantize (rounding.quantize twin) — NOT the module's
        # sql_quantize, which is the int8 VECTOR quantizer
        return f"CAST(floor(({e}) * 1000000.0 + 0.5) AS BIGINT)"

    arms = [
        _fp_arm(
            "lineitem",
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_linenumber",
                qz("l_quantity"),
                qz("l_extendedprice"),
                "l_returnflag",
                "l_linestatus",
                "epoch_us(l_shipdate)",
            ],
        ),
        _fp_arm(
            "orders",
            [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                qz("o_totalprice"),
                "epoch_us(o_orderdate)",
                "o_orderpriority",
            ],
        ),
        _fp_arm(
            "events",
            [
                "event_id",
                "epoch_us(ts)",
                "user_id",
                "event_type",
                qz("value"),
                "props",
            ],
        ),
    ]
    return "\nUNION ALL\n".join(arms)


def sql_cosupply_communities(rounds: int = 4) -> str:
    """Twin of operators/graph.py:cosupply_communities — mutual-kNN
    edges (shared CTE) + synchronous label-propagation rounds
    unrolled as CTE stages; the most-frequent-neighbor-label argmax
    with min-label tie-break is a row_number window, identical in
    both engines."""
    parts = [
        f"""{_cosupply_edges_cte()},
sym AS (
  SELECT u AS node, v AS nbr FROM edges
  UNION ALL
  SELECT v AS node, u AS nbr FROM edges
),
l0 AS (SELECT DISTINCT node, node AS label FROM sym)"""
    ]
    prev = "l0"
    for r in range(1, rounds + 1):
        parts.append(f"""f{r} AS (
  SELECT s.node, l.label, count(*) AS cnt
  FROM sym s JOIN {prev} l ON s.nbr = l.node
  GROUP BY s.node, l.label
),
l{r} AS (
  SELECT node, label FROM (
    SELECT node, label, row_number() OVER (
      PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
    FROM f{r}
  ) WHERE rn = 1
)""")
        prev = f"l{r}"
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT node AS s_suppkey, label AS community FROM {prev}"""


def sql_mmr_topk(k: int = 4, m: int = 16, dim: int = 64) -> str:
    """Twin of operators/similarity.py:mmr_topk — the greedy stages
    unrolled as CTEs: identical candidate ranking, identical
    ``0.75 * sim - 0.25 * max_pairwise`` arithmetic (both weights
    exact binary fractions), identical neighbor_id tie-breaks."""
    sim_qc = sql_cosine("cv", "qv", dim)
    parts = [f"""q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {sim_qc} AS sim, cv
  FROM c CROSS JOIN q WHERE neighbor_id != query_id
),
cand AS (
  SELECT query_id, neighbor_id, sim, cv FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY sim DESC, neighbor_id ASC) AS rnk FROM scored)
  WHERE rnk <= {m}
),
s1 AS (
  SELECT query_id, neighbor_id, sim, cv, 1 AS mmr_rank,
         0.75 * sim AS mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY sim DESC, neighbor_id ASC) AS r FROM cand)
  WHERE r = 1
),
sel1 AS (SELECT query_id, neighbor_id, cv FROM s1)"""]
    pair = sql_cosine("t.cv", "s.cv", dim)
    for step in range(2, k + 1):
        prev = step - 1
        parts.append(f"""pen{step} AS (
  SELECT t.query_id, t.neighbor_id, max({pair}) AS pen
  FROM cand t JOIN sel{prev} s ON t.query_id = s.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM sel{prev} x
    WHERE x.query_id = t.query_id
      AND x.neighbor_id = t.neighbor_id)
  GROUP BY t.query_id, t.neighbor_id
),
sc{step} AS (
  SELECT c2.query_id, c2.neighbor_id, c2.sim, c2.cv,
         0.75 * c2.sim - 0.25 * p.pen AS mmr_score
  FROM cand c2 JOIN pen{step} p
    ON c2.query_id = p.query_id AND c2.neighbor_id = p.neighbor_id
),
s{step} AS (
  SELECT query_id, neighbor_id, sim, cv, {step} AS mmr_rank,
         mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY mmr_score DESC, neighbor_id ASC) AS r FROM sc{step})
  WHERE r = 1
),
sel{step} AS (
  SELECT query_id, neighbor_id, cv FROM sel{prev}
  UNION ALL
  SELECT query_id, neighbor_id, cv FROM s{step}
)""")
    body = ",\n".join(parts)
    arms = "\nUNION ALL\n".join(
        f"SELECT query_id, mmr_rank, neighbor_id, "
        f"{sql_stable_round('mmr_score', 6)} AS mmr_score FROM s{i}"
        for i in range(1, k + 1)
    )
    return f"WITH {body}\n{arms}"


def sql_cosupply_kcore(k: int = 3, rounds: int = 8) -> str:
    """Twin of operators/graph.py:cosupply_kcore — the peel rounds
    unrolled as CTE stages over the shared mutual-kNN edge CTE; the
    engine's assert_true proves the fixpoint, so round ``rounds``
    here equals the true k-core."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # each round references the previous one several times — without
    # materialization the expansion is exponential in `rounds`.
    parts = [
        f"{_cosupply_edges_cte()},\n"
        "e0 AS MATERIALIZED (SELECT u, v FROM edges)"
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(f"""d{r} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM {prev}
    UNION ALL SELECT v FROM {prev}) GROUP BY node
),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  JOIN d{r} a ON e.u = a.node AND a.deg >= {k}
  JOIN d{r} b ON e.v = b.node AND b.deg >= {k}
)""")
        prev = f"e{r}"
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
GROUP BY node"""


def sql_ann_ivfpq_topk(
    k: int = 5,
    dim: int = 64,
    centroid_mod: int = 40,
    nprobe: int = 2,
    cb_mod: int = 20,
    n_sub: int = 8,
    sub: int = 8,
    adc_scale: int = 1 << 20,
    rerank_factor: int = 4,
) -> str:
    """Twin of operators/similarity.py:ivfpq_topk — coarse quantizer,
    residual product quantization, integer-quantized ADC scan, exact
    re-rank. ADC partials are floor(dot * scale + 0.5) BIGINTs, so the
    cross-row sum is associative and engine-identical."""
    m_rerank = k * rerank_factor
    assign_sim = sql_cosine("v.embedding", "c.cent_vec", dim)
    res = (
        "[CAST(embedding[i] AS DOUBLE) - CAST(cent_vec[i] AS DOUBLE) "
        f"FOR i IN generate_series(1, {dim})]"
    )
    subvec = f"[res[i] FOR i IN generate_series(m * {sub} + 1, m * {sub} + {sub})]"
    l2 = (
        "list_reduce([(sv[i] - cw[i]) * (sv[i] - cw[i]) "
        f"FOR i IN generate_series(1, {sub})], (x, y) -> x + y)"
    )
    qdot_cent = (
        "list_reduce([CAST(qv[i] AS DOUBLE) * CAST(cent_vec[i] AS DOUBLE) "
        f"FOR i IN generate_series(1, {dim})], (x, y) -> x + y)"
    )
    part_dot = (
        "list_reduce([q_sub[i] * cw[i] "
        f"FOR i IN generate_series(1, {sub})], (x, y) -> x + y)"
    )
    rerank_sim = sql_cosine("cf.c_vec", "qf.q_vec", dim)
    return f"""
WITH ms AS (SELECT unnest(generate_series(0, {n_sub - 1})) AS m),
cent AS (
  SELECT vec_id AS centroid_id, embedding AS cent_vec FROM embeddings
  WHERE vec_id % {centroid_mod} = 0
),
assigned0 AS (
  SELECT v.vec_id AS nid, v.embedding, c.centroid_id, c.cent_vec,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {assign_sim} DESC, c.centroid_id ASC)
           AS c_rank
  FROM embeddings v CROSS JOIN cent c
),
assigned AS (
  SELECT nid, centroid_id, embedding, {res} AS res
  FROM assigned0 WHERE c_rank = 1
),
cb AS (
  SELECT nid AS code_id, m, {subvec} AS cw
  FROM assigned CROSS JOIN ms WHERE nid % {cb_mod} = 0
),
doc_sub AS (
  SELECT nid, centroid_id, m, {subvec} AS sv
  FROM assigned CROSS JOIN ms
),
enc0 AS (
  SELECT d.nid, d.centroid_id, d.m, cb.code_id,
         row_number() OVER (PARTITION BY d.nid, d.m
                            ORDER BY {l2} ASC, cb.code_id ASC) AS e_rank
  FROM doc_sub d JOIN cb ON cb.m = d.m
),
codes AS (
  SELECT nid, centroid_id, m, code_id AS code FROM enc0 WHERE e_rank = 1
),
probes0 AS (
  SELECT v.vec_id AS qid, v.embedding AS qv, c.centroid_id, c.cent_vec,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {assign_sim} DESC, c.centroid_id ASC)
           AS c_rank
  FROM embeddings v CROSS JOIN cent c WHERE v.vec_id % 100 = 0
),
probes AS (
  SELECT qid, centroid_id, qv,
         CAST(floor({qdot_cent} * {adc_scale}.0 + 0.5) AS BIGINT) AS base_i,
         [CAST(qv[i] AS DOUBLE)
          FOR i IN generate_series(1, {dim})] AS q_dbl
  FROM probes0 WHERE c_rank <= {nprobe}
),
q_sub AS (
  SELECT qid, centroid_id, base_i, m,
         [q_dbl[i] FOR i IN generate_series(m * {sub} + 1, m * {sub} + {sub})] AS q_sub
  FROM probes CROSS JOIN ms
),
adc AS (
  SELECT q.qid, q.centroid_id, q.base_i, q.m, cb.code_id AS code,
         CAST(floor({part_dot} * {adc_scale}.0 + 0.5) AS BIGINT) AS part_i
  FROM q_sub q JOIN cb ON cb.m = q.m
),
approx AS (
  SELECT a.qid, c.nid,
         max(a.base_i) + sum(a.part_i) AS adc_i
  FROM codes c
  JOIN adc a ON a.centroid_id = c.centroid_id AND a.m = c.m
            AND a.code = c.code
  WHERE c.nid != a.qid
  GROUP BY a.qid, c.nid
),
cand AS (
  SELECT qid, nid FROM (
    SELECT *, row_number() OVER
      (PARTITION BY qid ORDER BY adc_i DESC, nid ASC) AS arank
    FROM approx
  ) WHERE arank <= {m_rerank}
),
cf AS (SELECT vec_id AS nid, embedding AS c_vec FROM embeddings),
qf AS (SELECT vec_id AS qid, embedding AS q_vec FROM embeddings
       WHERE vec_id % 100 = 0),
exact AS (
  SELECT cand.qid, cand.nid, {rerank_sim} AS sim
  FROM cand JOIN cf ON cf.nid = cand.nid JOIN qf ON qf.qid = cand.qid
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
  FROM exact
)
SELECT qid AS query_id, rank, nid AS neighbor_id,
       {sql_stable_round('sim', 6)} AS cosine_sim
FROM r WHERE rank <= {k}"""


def sql_pq_kmeans_codebooks(
    dim: int = 64,
    centroid_mod: int = 40,
    cb_mod: int = 20,
    n_sub: int = 8,
    sub: int = 8,
    iters: int = 2,
) -> str:
    """Twin of operators/similarity.py:pq_kmeans_codebooks — coarse
    residuals, per-subspace integer-quantized Lloyd (iterations
    unrolled, subspace index m carried through every key), trained
    codebooks exploded to scalar rows. Same exact integer math as
    sql_kmeans_lloyd; HUGEINT cast back to BIGINT at output edges."""
    from .operators.clustering import KMEANS_OFFSET, KMEANS_QS

    qm = f"{float(10 ** KMEANS_QS)!r}"
    assign_sim = sql_cosine("v.embedding", "c.cent_vec", dim)
    res = (
        "[CAST(embedding[i] AS DOUBLE) - CAST(cent_vec[i] AS DOUBLE) "
        f"FOR i IN generate_series(1, {dim})]"
    )
    qvec = (
        f"[CAST(floor(res[m * {sub} + i] * {qm} + 0.5) AS BIGINT)"
        f" + {KMEANS_OFFSET} FOR i IN generate_series(1, {sub})]"
    )
    dist = (
        "list_reduce([(s.qvec[i] - c.cvec[i]) * (s.qvec[i] - c.cvec[i]) "
        f"FOR i IN generate_series(1, {sub})], (x, y) -> x + y)"
    )
    parts = [
        f"""ms AS (SELECT unnest(generate_series(0, {n_sub - 1})) AS m),
cent AS (
  SELECT vec_id AS centroid_id, embedding AS cent_vec FROM embeddings
  WHERE vec_id % {centroid_mod} = 0
),
assigned0 AS (
  SELECT v.vec_id AS nid, v.embedding, c.cent_vec,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {assign_sim} DESC, c.centroid_id ASC)
           AS c_rank
  FROM embeddings v CROSS JOIN cent c
),
assigned AS (
  SELECT nid, {res} AS res FROM assigned0 WHERE c_rank = 1
),
subs AS (
  SELECT nid, m, {qvec} AS qvec FROM assigned CROSS JOIN ms
),
cent0 AS (
  SELECT m, nid AS cid, qvec AS cvec FROM subs WHERE nid % {cb_mod} = 0
)"""
    ]
    prev = "cent0"
    for it in range(1, iters + 1):
        parts.append(f"""a{it} AS (
  SELECT s.nid, s.m, s.qvec, c.cid, {dist} AS dist,
         row_number() OVER (PARTITION BY s.nid, s.m
                            ORDER BY {dist} ASC, c.cid ASC) AS rn
  FROM subs s JOIN {prev} c ON c.m = s.m
),
m{it} AS (SELECT nid, m, qvec, cid FROM a{it} WHERE rn = 1),
d{it} AS (
  SELECT m, cid, j,
         CAST((2 * sum(qvec[j]) + count(*)) // (2 * count(*)) AS BIGINT)
           AS cq,
         count(*) AS n
  FROM m{it} CROSS JOIN generate_series(1, {sub}) AS g(j)
  GROUP BY m, cid, j
),
cent{it} AS (
  SELECT m, cid, list(cq ORDER BY j) AS cvec, max(n) AS n_members
  FROM d{it} GROUP BY m, cid
)""")
        prev = f"cent{it}"
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT CAST(m AS BIGINT) AS m, cid AS code_id, n_members,
       CAST(j - 1 AS BIGINT) AS dim_j, cvec[j] AS cq
FROM {prev} CROSS JOIN generate_series(1, {sub}) AS g(j)"""


def sql_drop_boilerplate_lines(max_df_pct: int | None = None) -> str:
    """Twin of operators/corpus_quality.py:drop_boilerplate_lines over
    the with_synthetic_boilerplate corpus (footer line in every doc,
    promo line in even-id docs)."""
    from .operators import corpus_quality as CQ

    pct = CQ.BOILER_MAX_DF_PCT if max_df_pct is None else max_df_pct
    return f"""
WITH bdocs AS (
  SELECT doc_id,
         text || chr(10) || '{CQ.BOILER_LINE_A}' ||
         CASE WHEN doc_id % 2 = 0
              THEN chr(10) || '{CQ.BOILER_LINE_B}' ELSE '' END AS t
  FROM documents
),
bsplit AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM bdocs),
blines AS (
  SELECT doc_id, pos, ls[pos] AS line FROM (
    SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS pos
    FROM bsplit)
),
btot AS (SELECT count(*) AS n_docs FROM bdocs),
boiler AS (
  SELECT line FROM blines CROSS JOIN btot
  GROUP BY line, n_docs
  HAVING count(DISTINCT doc_id) * 100 > {pct} * n_docs
),
bkept AS (
  SELECT * FROM blines
  WHERE line NOT IN (SELECT line FROM boiler)
),
breasm AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM bkept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(string_split(d.t, chr(10))) - COALESCE(r.n_kept, 0)
            AS BIGINT) AS n_dropped
FROM bdocs d LEFT JOIN breasm r USING (doc_id)"""


def sql_entity_clusters() -> str:
    """Twin of operators/linkage.py:entity_clusters over the
    synthetic person dimension (names from the 12x12 part lists,
    every 7th person re-appearing as a one-char-dropped variant):
    distinct-name dictionary, two-pass blocking (2-char prefix +
    suffix), levenshtein <= 2 match, recursive-CTE reachability
    closure for the transitive clusters."""
    from .operators import linkage as LK

    first = "[" + ", ".join(f"'{x}'" for x in LK.NAME_FIRST) + "]"
    last = "[" + ", ".join(f"'{x}'" for x in LK.NAME_LAST) + "]"
    return f"""
WITH RECURSIVE ppl0 AS (
  SELECT CAST(c_custkey AS BIGINT) AS person_id,
         ({first})[CAST(c_custkey % 12 + 1 AS INTEGER)] || ' ' ||
         ({last})[CAST((c_custkey // 12) % 12 + 1 AS INTEGER)] AS name
  FROM customer
),
var0 AS (
  SELECT person_id + {LK.VARIANT_ID_OFFSET} AS person_id,
         substring(name, 1, p - 1) ||
         substring(name, p + 1, length(name)) AS name
  FROM (SELECT person_id, name,
               CAST(1 + person_id % length(name) AS INTEGER) AS p
        FROM ppl0 WHERE person_id % {LK.VARIANT_EVERY} = 0)
),
people AS (SELECT * FROM ppl0 UNION ALL SELECT * FROM var0),
names AS (SELECT name, min(person_id) AS nid FROM people GROUP BY name),
keyed0 AS (
  SELECT name, nid,
         unnest(['p:' || substring(name, 1, 2),
                 's:' || substring(name, length(name) - 1, 2)]) AS bk
  FROM names
),
keyed AS (
  -- deterministic per-block name cap (linkage.py BLOCK_CAP); never
  -- binds at the 144-name dictionary but kept twin-exact
  SELECT name, nid, bk FROM (
    SELECT name, nid, bk,
           row_number() OVER (
             PARTITION BY bk ORDER BY md5(bk || '|' || name), nid
           ) AS _br
    FROM keyed0)
  WHERE _br <= {LK.BLOCK_CAP}
),
lpairs AS (
  SELECT DISTINCT a.nid AS na, b.nid AS nb
  FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.nid < b.nid
  WHERE levenshtein(a.name, b.name) <= {LK.LEV_MAX_DIST}
),
ledges AS (
  SELECT na AS a, nb AS b FROM lpairs
  UNION
  SELECT nb AS a, na AS b FROM lpairs
),
lreach AS (
  SELECT a AS node, a AS r FROM ledges
  UNION
  SELECT e.a AS node, lreach.r AS r
  FROM ledges e JOIN lreach ON e.b = lreach.node
),
ncl AS (SELECT node AS nid, min(r) AS cluster_id FROM lreach GROUP BY node)
SELECT p.person_id, p.name,
       COALESCE(ncl.cluster_id, nm.nid) AS cluster_id
FROM people p
JOIN names nm USING (name)
LEFT JOIN ncl ON ncl.nid = nm.nid"""


def sql_wordpiece_doc_scores(
    k: int = 256, maxlen: int = 4, max_word: int = 32
) -> str:
    """Twin of tokenizer.wordpiece_doc_scores: corpus-derived top-k
    piece vocab (count DESC, piece ASC), integer log2-frequency
    weights via length(bin(cnt)), longest-match selection through the
    bl*ENC+wq integer pack, and the consume-and-jump segmentation as
    list_reduce with the declared-seed sentinel (elements carry
    zeroed state; a prepended sentinel absorbs DuckDB's
    seed-with-first-element). Fold struct fields are ordered
    readers-first/writers-last (np/sq/unk read only pre-update pos;
    pos last) — correct under both list_reduce semantics, see
    _sql_cusum_changepoints."""
    enc = 1_000_000
    words = _sql_bpe_words("char").format(ids="")
    dw = _sql_bpe_words("char").format(ids="doc_id,")
    zero_state = (
        "'np': CAST(0 AS BIGINT), 'sq': CAST(0 AS BIGINT), "
        "'unk': false, 'pos': CAST(1 AS INTEGER)"
    )
    step = f"""{{
      'np': CAST(acc.np + CASE WHEN x.i = acc.pos THEN 1 ELSE 0 END
                 AS BIGINT),
      'sq': CAST(acc.sq + CASE WHEN x.i = acc.pos AND x.bl > 0
                               THEN x.wq ELSE 0 END AS BIGINT),
      'unk': acc.unk OR (x.i = acc.pos AND x.bl = 0),
      'pos': CAST(acc.pos + CASE WHEN x.i = acc.pos
                                 THEN greatest(x.bl, 1) ELSE 0 END
                  AS INTEGER),
      'i': x.i, 'bl': x.bl, 'wq': x.wq
    }}"""
    return f"""
WITH wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS f FROM ({words}
  GROUP BY w
),
shortw AS (SELECT w, f FROM wf WHERE length(w) <= {max_word}),
cand AS (
  SELECT w, i, l,
         substr(w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece
  FROM (
    SELECT w, i,
           unnest(generate_series(1, least({maxlen}, length(w) - i + 1)))
             AS l
    FROM (SELECT w, unnest(generate_series(1, length(w))) AS i
          FROM shortw)
  )
),
vocab AS (
  SELECT piece, CAST(length(bin(cnt)) AS BIGINT) AS piece_w
  FROM (
    SELECT c.piece, CAST(sum(s.f) AS BIGINT) AS cnt
    FROM cand c JOIN shortw s USING (w)
    GROUP BY c.piece
  )
  ORDER BY cnt DESC, piece LIMIT {k}
),
best AS (
  SELECT c.w, c.i,
         COALESCE(max(CASE WHEN v.piece_w IS NOT NULL
                           THEN c.l * {enc} + v.piece_w END),
                  0) AS enc
  FROM cand c LEFT JOIN vocab v USING (piece)
  GROUP BY c.w, c.i
),
elems AS (
  SELECT w,
         list({{{zero_state},
               'i': CAST(i AS INTEGER),
               'bl': CAST(enc // {enc} AS INTEGER),
               'wq': CAST(enc % {enc} AS BIGINT)}} ORDER BY i) AS es
  FROM best GROUP BY w
),
folded AS (
  SELECT w,
         list_reduce(
           list_prepend({{{zero_state},
                         'i': CAST(0 AS INTEGER),
                         'bl': CAST(0 AS INTEGER),
                         'wq': CAST(0 AS BIGINT)}}, es),
           (acc, x) -> {step}) AS st
  FROM elems
),
seg AS (
  SELECT w,
         CASE WHEN st.unk THEN 1 ELSE st.np END AS n_pieces,
         CASE WHEN st.unk THEN 0 ELSE st.sq END AS lm_score_q,
         st.unk AS is_unk
  FROM folded
  UNION ALL
  SELECT w, 1, 0, true FROM wf WHERE length(w) > {max_word}
),
dw AS (
  SELECT doc_id, w FROM ({dw}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(CASE WHEN is_unk THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unk_words,
       CAST(sum(lm_score_q) AS BIGINT) AS lm_score_q
FROM dw JOIN seg USING (w)
GROUP BY doc_id"""
