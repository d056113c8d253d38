"""Dialect-paired text expression builders (Spark SQL + DuckDB SQL).

Every text operator needs two renderings of the same logic: a Spark
Column expression for the engine and an ANSI-ish SQL string for the
DuckDB oracle.  Writing both by hand invites drift, so each helper here
renders ONE logical expression in either dialect; the operator uses the
``spark`` dialect via ``F.expr`` and the query registry renders the
oracle with the ``duck`` dialect.  Cross-engine agreement of the
primitives (regex split, md5-prefix→int64, shingling) is pinned by
tests/test_text_ops.py.

Hash note: the only cross-engine-stable 64-bit string hash available in
both engines is an md5 prefix — ``conv(substr(md5(s),1,15),16,10)`` in
Spark ≡ ``('0x' || substr(md5(s),1,15))::BIGINT`` in DuckDB (15 hex
digits = 60 bits, fits signed int64). xxhash64/hash() are
engine-specific and must never appear in an oracle-checked expression.
"""

from __future__ import annotations

TOKEN_PATTERN = "[^a-z0-9]+"
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WS_PATTERN = r"\s+"
CJK_NEGATED_CLASS = "[^一-鿿]"
PUNCT_NEGATED_CLASS = r"[A-Za-z0-9\s]"

STOPWORDS = {
    "en": ("the", "and", "is", "of", "to", "in", "a", "that", "it", "for"),
    "es": ("el", "los", "y", "es", "una", "en", "por", "que", "las", "con"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "au"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
}


class Dialect:
    """Renders the shared text expressions in one engine's SQL."""

    def __init__(self, name: str):
        assert name in ("spark", "duck")
        self.name = name

    def _q(self, s: str) -> str:
        """String literal. Spark's SQL parser processes backslash escapes
        inside single quotes ('\\s' → 's'), DuckDB does not — so regex
        backslashes must be doubled for Spark only."""
        if self.name == "spark":
            s = s.replace("\\", "\\\\")
        return "'" + s.replace("'", "''") + "'"

    # ---- primitives -----------------------------------------------------
    def size(self, arr: str) -> str:
        return f"size({arr})" if self.name == "spark" else f"len({arr})"

    def filter(self, arr: str, lam: str) -> str:
        fn = "filter" if self.name == "spark" else "list_filter"
        return f"{fn}({arr}, {lam})"

    def transform(self, arr: str, lam: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {lam})"

    def split(self, col: str, pattern: str) -> str:
        fn = "split" if self.name == "spark" else "string_split_regex"
        return f"{fn}({col}, {self._q(pattern)})"

    def array_min(self, arr: str) -> str:
        return f"array_min({arr})" if self.name == "spark" else f"list_min({arr})"

    def regexp_extract_all(self, col: str, pattern: str) -> str:
        if self.name == "spark":
            return f"regexp_extract_all({col}, {self._q(pattern)}, 0)"
        return f"regexp_extract_all({col}, {self._q(pattern)})"

    def regexp_remove(self, col: str, pattern: str) -> str:
        # DuckDB replaces only the first match unless given the 'g' flag;
        # Spark is global by default.
        if self.name == "spark":
            return f"regexp_replace({col}, {self._q(pattern)}, '')"
        return f"regexp_replace({col}, {self._q(pattern)}, '', 'g')"

    def regexp_sub(self, col: str, pattern: str, repl: str) -> str:
        """Global regex substitution with a literal replacement string."""
        if self.name == "spark":
            return f"regexp_replace({col}, {self._q(pattern)}, {self._q(repl)})"
        return f"regexp_replace({col}, {self._q(pattern)}, {self._q(repl)}, 'g')"

    def md5_long(self, expr: str) -> str:
        if self.name == "spark":
            return f"CAST(conv(substr(md5({expr}),1,15),16,10) AS BIGINT)"
        return f"(('0x' || substr(md5({expr}),1,15))::BIGINT)"

    # ---- composed text expressions --------------------------------------
    def tokens(self, col: str) -> str:
        """Lowercased alphanumeric tokens, empties dropped."""
        return self.filter(self.split(f"lower({col})", TOKEN_PATTERN), "t -> t <> ''")

    def ws_token_count(self, col: str) -> str:
        """Whitespace token count of the trimmed text (0 for blank)."""
        return (
            f"CASE WHEN trim({col}) = '' THEN 0 ELSE "
            + self.size(self.split(f"trim({col})", WS_PATTERN))
            + " END"
        )

    def bpe_token_count(self, col: str) -> str:
        """BPE-ish token count: letter runs, digit runs, single symbols."""
        return self.size(self.regexp_extract_all(col, BPE_PATTERN))

    def char_count(self, col: str) -> str:
        return f"length({col})"

    def cjk_count(self, col: str) -> str:
        return f"length({self.regexp_remove(col, CJK_NEGATED_CLASS)})"

    def stopword_hits(self, tokens_expr: str, lang: str) -> str:
        words = ", ".join(self._q(w) for w in STOPWORDS[lang])
        return self.size(self.filter(tokens_expr, f"t -> t IN ({words})"))

    def shingles(self, tokens_expr: str, k: int) -> str:
        """Word k-grams joined by single spaces.

        The sequence end is clamped to 1, not 0: Spark's ``sequence(1, 0)``
        counts DOWN ([1, 0]) and a 0 index breaks 1-based ``slice``.  With
        the clamp, a doc with fewer than k tokens yields exactly one
        undersized shingle = the whole token list — which both engines
        hash identically (slice/[i:j] clamp to list bounds).
        """
        n = self.size(tokens_expr)
        if self.name == "spark":
            seq = f"sequence(1, greatest({n} - {k - 1}, 1))"
            return f"transform({seq}, i -> array_join(slice({tokens_expr}, i, {k}), ' '))"
        seq = f"generate_series(1, greatest({n} - {k - 1}, 1))"
        return f"list_transform({seq}, i -> coalesce(array_to_string(({tokens_expr})[i:i+{k - 1}], ' '), ''))"

    def fingerprint(self, col: str, k: int = 3) -> str:
        """Content fingerprint: min md5-int64 over word k-shingles (a
        1-permutation MinHash). Zero-token docs hash the empty string —
        DuckDB's array_to_string([]) is NULL, hence the coalesce. NULL
        text is NULL on BOTH engines: without the CASE guard that same
        coalesce would manufacture md5('') for NULL docs on DuckDB while
        Spark's shingle chain yields NULL (found by dialect fuzzing)."""
        toks = self.tokens(col)
        hashed = self.transform(self.shingles(toks, k), f"s -> {self.md5_long('s')}")
        # ({col}) parenthesized: a compound expression argument (e.g. a
        # concatenation) must not re-bind against IS NULL
        return f"CASE WHEN ({col}) IS NULL THEN NULL ELSE {self.array_min(hashed)} END"

    def punct_count(self, col: str) -> str:
        return f"length({self.regexp_remove(col, PUNCT_NEGATED_CLASS)})"

    def digit_count(self, col: str) -> str:
        return f"length({self.regexp_remove(col, '[^0-9]')})"

    def ratio(self, num: str, den: str) -> str:
        # identical IEEE double division on both engines
        return f"(CAST({num} AS DOUBLE) / CAST(greatest({den}, 1) AS DOUBLE))"

    def mean_token_len(self, col: str, tokens_expr: str | None = None) -> str:
        # coalesce: DuckDB's array_to_string([], '') is NULL, Spark's
        # array_join([], '') is '' — normalize to 0 on both sides.
        # tokens_expr: pass a pre-staged tokens COLUMN to avoid
        # re-tokenizing (values identical either way).
        toks = tokens_expr or self.tokens(col)
        join_fn = "array_join" if self.name == "spark" else "array_to_string"
        return self.ratio(f"coalesce(length({join_fn}({toks}, '')), 0)", self.size(toks))

    def quality_score(self, col: str, tokens_expr: str | None = None) -> str:
        """Deterministic [0,1] quality heuristic: length credit + low-punct
        credit + stopword-density credit. Only +,*,/,least — no
        transcendentals, so bit-identical across engines."""
        toks = tokens_expr or self.tokens(col)
        len_credit = f"least({self.ratio(self.ws_token_count(col), '100')}, 1.0)"
        punct_credit = f"(1.0 - {self.ratio(self.punct_count(col), self.char_count(col))})"
        stop_credit = f"least({self.ratio(self.stopword_hits(toks, 'en'), self.size(toks))} * 5.0, 1.0)"
        return f"(0.4 * {len_credit} + 0.3 * {punct_credit} + 0.3 * {stop_credit})"

    def lang_id(self, col: str, tokens_expr: str | None = None) -> str:
        """Heuristic language ID: CJK-char ratio gate, then stopword-hit
        argmax with a fixed priority tie-break (en,es,fr,de), 'und' if no
        hits. Deterministic by construction."""
        toks = tokens_expr or self.tokens(col)
        hits = {lang: self.stopword_hits(toks, lang) for lang in STOPWORDS}
        cjk = self.cjk_count(col)
        chars = f"greatest({self.char_count(col)}, 1)"
        best = f"greatest({hits['en']}, {hits['es']}, {hits['fr']}, {hits['de']})"
        return (
            "CASE "
            f"WHEN {cjk} * 10 > {chars} * 3 THEN 'zh' "
            f"WHEN {best} = 0 THEN 'und' "
            f"WHEN {hits['en']} = {best} THEN 'en' "
            f"WHEN {hits['es']} = {best} THEN 'es' "
            f"WHEN {hits['fr']} = {best} THEN 'fr' "
            "ELSE 'de' END"
        )


SPARK = Dialect("spark")
DUCK = Dialect("duck")
