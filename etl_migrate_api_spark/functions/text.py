"""String/text scalar operators — all pure column expressions (JVM-side,
whole-stage-codegen friendly). No Python UDFs in this module.

Reference parity (SURVEY.md §2h):
  - extract_phones ≡ ``extractPhones`` (reference src/services/groupContact.js:2-9)
  - norm_str       ≡ ``norm``          (reference src/services/groupContact.js:14-18)
  - split_csv/join_csv ≡ note_other parse/serialize (groupContact.js:65-67, 80-81)

LLM-pipeline text analysis (BASELINE.json north star): token_count,
lang_id, quality_score, fingerprint, shingles/ngrams.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def extract_phones(c: ColumnOrName) -> Column:
    """Tokenize a multi-phone string into ``array<string>``.

    Semantics of reference groupContact.js:2-9: remove all spaces, split on
    runs of ``,`` ``;`` ``/``, drop empty tokens. Null input → empty array.
    """
    cleaned = F.regexp_replace(_col(c), " ", "")
    toks = F.split(cleaned, "[,;/]+")
    toks = F.filter(toks, lambda x: (x.isNotNull()) & (x != ""))
    return F.coalesce(toks, F.array().cast("array<string>"))


def norm_str(c: ColumnOrName) -> Column:
    """Trim; empty string → NULL; else the trimmed string.

    Reference groupContact.js:14-18.
    """
    return F.nullif(F.trim(_col(c).cast("string")), F.lit(""))


# PII patterns: syntax with identical semantics in Java regex (Spark)
# and RE2 (DuckDB oracle) — char classes, bounded repeats; no backrefs,
# no lookaround. Consumed by plans/llm_curation.py (batch + oracle) and
# streaming/pipeline.py (continuous curation).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-\d{3}-\d{4}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def redact_pii(c: ColumnOrName) -> Column:
    """Redact emails → phones → IPv4s (fixed order — overlapping
    matches resolve identically everywhere this chain is mirrored)."""
    after_email = F.regexp_replace(_col(c), PII_EMAIL, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PII_PHONE, "<PHONE>")
    return F.regexp_replace(after_phone, PII_IPV4, "<IP>")


#: the ONE whitespace class, as an explicit char set: Java's \s includes
#: \x0B (vertical tab) while RE2's (DuckDB) does not, so a bare \s+
#: would silently tokenize differently across engines. The SQL mirrors
#: must use this same class: '[ \t\r\n\f]+'.
WS_CLASS = r"[ \t\r\n\f]+"

#: DuckDB twin of :func:`ws_tokens` over the ``text`` column — the ONE
#: canonical SQL tokenizer for oracle queries. Keep in lockstep with
#: WS_CLASS and ws_tokens. (Older oracle SQL in plans/llm_ops.py and
#: plans/llm_curation.py embeds this literal inline — some sites
#: deliberately skip lower() for case-preserving analyses; new oracles
#: must interpolate this constant instead of copying the literal.)
SQL_WS_TOKENS = (
    "list_filter(string_split_regex(lower(trim(text)),"
    " '[ \\t\\r\\n\\f]+'), x -> x <> '')"
)


def ws_tokens(c: ColumnOrName) -> Column:
    """Whitespace tokens of lower(trim(c)), empties removed — the ONE
    tokenization the curation operators, the streaming curation pass,
    and their DuckDB mirrors (``list_filter(string_split_regex(
    lower(trim(text)), '[ \\t\\r\\n\\f]+'), x -> x <> '')``) must agree
    on. Change it only together with the SQL (WS_CLASS)."""
    return F.array_remove(F.split(F.lower(F.trim(_col(c))), WS_CLASS), "")


def top_token_run(toks: Column) -> Column:
    """Count of the most frequent element of a (token) array, as a
    per-row O(n log n) expression: sort, then fold counting the longest
    equal-run. The array form of the explode→group max-frequency signal
    (llm_quality_repetition) for stateless/streaming contexts. Empty
    array → 0."""
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    run = lambda a, x: F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))  # noqa: E731
    folded = F.aggregate(
        F.array_sort(toks),
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            run(a, x).alias("run"),
            F.greatest(a["best"], run(a, x)).alias("best"),
        ),
    )
    return folded["best"]


def split_csv(c: ColumnOrName) -> Column:
    """Comma-split + trim + drop blanks → array<string> (note_other parse,
    reference groupContact.js:65-67). Null → empty array."""
    toks = F.transform(F.split(_col(c), ","), lambda x: F.trim(x))
    toks = F.filter(toks, lambda x: x != "")
    return F.coalesce(toks, F.array().cast("array<string>"))


def join_csv(c: ColumnOrName) -> Column:
    """Comma-join an array; empty array → NULL (reference groupContact.js:80-81)."""
    arr = _col(c)
    return F.when(F.size(arr) > 0, F.array_join(arr, ",")).otherwise(F.lit(None))


# --------------------------------------------------------------------------
# LLM-data-pipeline text analysis (north-star extensions; no reference file —
# standard public techniques expressed as Spark built-ins).
# --------------------------------------------------------------------------


def tokens(c: ColumnOrName) -> Column:
    """Whitespace tokens, blanks dropped."""
    t = F.split(F.trim(_col(c)), WS_CLASS)
    return F.filter(t, lambda x: x != "")


def token_count(c: ColumnOrName) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(tokens(c)).cast("bigint")


def bpe_ish_token_count(c: ColumnOrName) -> Column:
    """A BPE-ish proxy: count word pieces + punctuation via regex, the way
    public tokenizer-estimate heuristics do (≈ GPT-2 pre-tokenizer regex,
    simplified to what Spark's RE2-like engine supports)."""
    # split into word / number / non-space-punct runs
    pieces = F.regexp_extract_all(
        _col(c), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces).cast("bigint")


_STOPWORDS = (
    "the,a,an,and,or,of,to,in,is,it,that,for,on,as,with,was,at,by,be,this"
).split(",")


def stopword_ratio(c: ColumnOrName) -> Column:
    """Fraction of whitespace tokens that are common English stopwords."""
    toks = F.transform(tokens(c), lambda x: F.lower(x))
    stop = F.filter(
        toks, lambda x: x.isin(*_STOPWORDS)  # type: ignore[arg-type]
    )
    n = F.size(toks)
    return F.when(n > 0, F.size(stop).cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(c: ColumnOrName) -> Column:
    """Fraction of characters that are punctuation-ish (non-alnum, non-space)."""
    s = _col(c)
    total = F.length(s)
    kept = F.length(F.regexp_replace(s, r"[^A-Za-z0-9\s]", ""))
    return F.when(total > 0, (total - kept).cast("double") / total).otherwise(
        F.lit(0.0)
    )


def lang_id(c: ColumnOrName) -> Column:
    """Cheap n-gram-free language heuristic: 'en' when ASCII-letter density
    is high and English stopwords appear; 'und' for empty; 'other' otherwise.

    A real deployment swaps in a fastText/CLD3 Pandas UDF; the contract
    (string label column) is identical.
    """
    s = _col(c)
    ascii_letters = F.length(F.regexp_replace(s, r"[^A-Za-z ]", ""))
    density = F.when(F.length(s) > 0, ascii_letters.cast("double") / F.length(s)).otherwise(F.lit(0.0))
    return (
        F.when(F.length(F.coalesce(s, F.lit(""))) == 0, F.lit("und"))
        .when((density >= 0.6) & (stopword_ratio(c) > 0.05), F.lit("en"))
        .when(density >= 0.6, F.lit("latin"))
        .otherwise(F.lit("other"))
    )


def quality_score(c: ColumnOrName) -> Column:
    """Composite 0..1 document-quality score from public heuristics
    (Gopher/C4-style): length band, punctuation sanity, stopword presence.

    Deterministic, pure-expression; same formula is mirrored in the DuckDB
    oracle SQL.
    """
    s = _col(c)
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct = punct_ratio(c)
    punct_ok = F.when(punct <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(c) >= 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_tok > 0,
        F.length(F.regexp_replace(s, WS_CLASS, "")).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    wordlen_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + stop_ok + wordlen_ok) / F.lit(4.0), 4)


def fingerprint(c: ColumnOrName) -> Column:
    """Deterministic document fingerprint: md5 of the case-folded,
    whitespace-collapsed text. Content-defined identity for exact dedup;
    md5 keeps the oracle (DuckDB ``md5``) bit-identical."""
    normalized = F.lower(F.regexp_replace(F.trim(_col(c)), WS_CLASS, " "))
    return F.md5(normalized)


ROLLING_P = 2_147_483_647  # 2^31 - 1, same modulus as the MinHash family
ROLLING_B = 131


def rolling_fingerprint(c: ColumnOrName) -> Column:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp style)
    over whitespace tokens: H = fold(tokens, (acc, t) → (acc·B +
    h(t)) mod P) with h(t) = 60-bit md5 int mod P. Token-order
    sensitive (unlike the bag-of-bytes md5 fingerprint) and
    incrementally updatable at a stream boundary. Engine-agnostic: the
    DuckDB oracle computes the identical fold via list_reduce (its
    first-element seed equals our 0-seed because (0·B + h₁) = h₁);
    empty docs hash to 0. All intermediates stay < 2³¹·B < 2⁶³."""
    th = F.transform(
        tokens(c),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
        % ROLLING_P,
    )
    return F.aggregate(
        th,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * ROLLING_B + h) % ROLLING_P,
    )


def char_shingles(c: ColumnOrName, k: int = 5) -> Column:
    """All k-character shingles of the normalized text → array<string>.
    Pure HOF (sequence + transform + substring) — stays JVM-side.

    NB: Spark's ``sequence(1, 0)`` is DESCENDING, not empty — short
    strings must be guarded explicitly."""
    s = F.lower(F.regexp_replace(F.trim(_col(c)), WS_CLASS, " "))
    n = F.length(s)
    shingles = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)), lambda i: F.substring(s, i, k)
    )
    return F.when(n >= k, shingles).otherwise(F.array().cast("array<string>"))


def word_ngrams(c: ColumnOrName, n: int = 3) -> Column:
    """Word n-grams (space-joined) → array<string>; JVM-side HOFs only."""
    toks = F.transform(tokens(c), lambda x: F.lower(x))
    cnt = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), cnt - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))
