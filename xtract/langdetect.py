"""Deterministic language identification (the ``detect_os`` analogue).

Reference: document-level script detection ``detect_os()`` →
``(orientation, orient_conf, script_name, script_conf)``
(``src/api.rs:599-629``) and per-word recognition language
(``src/result_iterator.rs:78-89``), backed by per-worker trained model
tables.  Ours: small stopword + distinctive-character tables per
language, integer scoring, single final division for the reported
confidence.  Tables are module constants (generated-at-build-time data,
the ``assets/`` analogue of build.rs:480-515); the actor builds its
lookup structures once in ``__init__``.

``set_min_orientation_margin`` analogue: a score below
``cfg.lang_conf_margin`` yields ``'und'`` (``src/api.rs:640-647``).
"""

from __future__ import annotations

import re

STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that he was for on are with as his they be at one have this from or had by word but what some we can out other were all there when up use your how said an each she".split()),
    "tr": frozenset("bir ve bu da de için ile olarak çok daha ama gibi en ne var olan sonra kadar her iki ben sen biz onlar mi mu değil ki diye yok oldu şu o ya hem ise".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über".split()),
    "fr": frozenset("le de la et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont son avec être mais comme ou si leur y dont elle deux".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al lo como más pero sus le ya o este sí porque esta entre cuando muy sin sobre también".split()),
    "it": frozenset("di e il la che in un per è una sono non con si da come lo anche le più nel questo ha gli alla dei essere sul della suo".split()),
    "pt": frozenset("de a o que e do da em um para é com não uma os no se na por mais as dos como mas foi ao ele das tem seu sua ou ser quando".split()),
    "nl": frozenset("de het een en van in is dat op te zijn met voor niet aan er ook als bij maar om uit dan zij naar dit toe door over ze hij".split()),
}

#: Distinctive characters: strong evidence for a language (integer weight 3
#: per occurrence, capped).
CHAR_EVIDENCE: dict[str, str] = {
    "tr": "ğışİıçĞŞÇ",
    "de": "ßäöüÄÖÜ",
    "fr": "àâæçéèêëîïôœùûüÿ",
    "es": "ñ¿¡áéíóú",
    "pt": "ãõáâêç",
}

LANGS = tuple(sorted(STOPWORDS))

_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


class LangDetector:
    """Warm per-worker detector: lookup dicts built once (actor state).

    Hot-path layout (profiled): ONE dict lookup per token
    (word → lang-index tuple) instead of a per-language set probe, and
    character evidence consulted only for non-ASCII tokens."""

    def __init__(self, langs: tuple[str, ...] = LANGS, margin: int = 2,
                 extra_stopwords: dict[str, frozenset] | None = None) -> None:
        tables = dict(STOPWORDS)
        if extra_stopwords:
            tables.update(extra_stopwords)
        self.langs = tuple(sorted(l for l in set(langs) if l in tables)) or LANGS
        self.margin = margin
        idx = {l: i for i, l in enumerate(self.langs)}
        word_langs: dict[str, tuple[int, ...]] = {}
        for l in self.langs:
            for w in tables[l]:
                word_langs[w] = word_langs.get(w, ()) + (idx[l],)
        self.word_langs = word_langs
        char_langs: dict[str, tuple[int, ...]] = {}
        for l in self.langs:
            for c in CHAR_EVIDENCE.get(l, ""):
                char_langs[c] = char_langs.get(c, ()) + (idx[l],)
        self.char_langs = char_langs

    def detect(self, text: str, max_tokens: int = 400) -> tuple[str, float]:
        """→ (lang, conf).  Integer scoring (stopword hit = +2, evidence
        char = +3); deterministic tie-break by alphabetical language code
        (self.langs is sorted); conf = best/total, single division."""
        scores = self._scores(text, max_tokens)
        best_score = max(scores) if scores else 0
        if best_score < self.margin:
            return "und", 0.0
        best = self.langs[scores.index(best_score)]
        total = sum(scores)
        return best, best_score / total if total else 0.0

    def _scores(self, text: str, max_tokens: int) -> list[int]:
        toks = _TOKEN_RE.findall(text.lower())[:max_tokens]
        scores = [0] * len(self.langs)
        wl, cl = self.word_langs, self.char_langs
        for t in toks:
            hit = wl.get(t)
            if hit is not None:
                for li in hit:
                    scores[li] += 2
            if not t.isascii():
                for c in t:
                    chit = cl.get(c)
                    if chit is not None:
                        for li in chit:
                            scores[li] += 3
        return scores

    def word_lang(self, word: str, default: str = "und") -> str:
        """Per-word recognition language (the
        ``word_recognition_language`` analogue, reference
        ``src/result_iterator.rs:78-89``): the language whose tables
        uniquely claim this word (stopword hit +2, distinctive char
        +3, same weights as ``detect``); unknown or ambiguous words
        inherit ``default`` (the block language).  Deterministic."""
        t = word.lower().strip(".,;:!?\"'()")
        scores: dict[int, int] = {}
        hit = self.word_langs.get(t)
        if hit:
            for li in hit:
                scores[li] = scores.get(li, 0) + 2
        if t and not t.isascii():
            for c in t:
                chit = self.char_langs.get(c)
                if chit:
                    for li in chit:
                        scores[li] = scores.get(li, 0) + 3
        if not scores:
            return default
        best = max(scores.values())
        if best < self.margin:
            return default
        winners = [li for li, s in scores.items() if s == best]
        if len(winners) > 1:
            return default  # ambiguous between languages → block lang
        return self.langs[winners[0]]

    def detect_alternatives(self, text: str, k: int = 3,
                            max_tokens: int = 400) -> list[tuple[str, float]]:
        """Ordered language alternatives, confidence descending with
        deterministic tie-break by language code — the ChoiceIterator
        analogue (reference src/choice_iterator.rs:30-71; ordering
        contract tested at tests/test_iterators.rs:736-769)."""
        scores = self._scores(text, max_tokens)
        return self._rank(scores, k)

    def _rank(self, scores: list[int], k: int) -> list[tuple[str, float]]:
        total = sum(scores)
        if total == 0:
            return []
        ranked = sorted(((s, l) for l, s in zip(self.langs, scores) if s > 0),
                        key=lambda p: (-p[0], p[1]))
        return [(l, s / total) for s, l in ranked[:k]]

    def detect_full(self, text: str, k: int = 3, max_tokens: int = 400
                    ) -> tuple[str, float, list[tuple[str, float]]]:
        """(lang, conf, alternatives) from ONE scoring pass — identical
        results to detect() + detect_alternatives(), half the work (the
        content path calls both per document)."""
        scores = self._scores(text, max_tokens)
        best_score = max(scores) if scores else 0
        if best_score < self.margin:
            return "und", 0.0, self._rank(scores, k)
        best = self.langs[scores.index(best_score)]
        total = sum(scores)
        conf = best_score / total if total else 0.0
        return best, conf, self._rank(scores, k)


def detector_for(cfg) -> "LangDetector":
    """Build the detector an ``ExtractionConfig`` asks for — honoring
    ``cfg.langs`` (the ``init(language)`` restriction analogue,
    reference ``src/api.rs:71-97``).  Every engine stage and the oracle
    construct their detector through THIS function so a restricted
    config provably changes detection everywhere or nowhere."""
    return LangDetector(langs=tuple(cfg.langs), margin=cfg.lang_conf_margin,
                        extra_stopwords=load_assets_dir(cfg.assets_dir)
                        if getattr(cfg, "assets_dir", "") else None)


def available_langs(assets_dir: str | None = None) -> tuple[str, ...]:
    """Discoverable language codes: the built-in tables plus any
    ``<code>.langdata.json`` files under ``assets_dir`` — the
    ``get_available_languages`` analogue (reference
    ``src/api.rs:882-922``: scans the datapath for ``*.traineddata``)."""
    langs = set(LANGS)
    if assets_dir:
        import os

        try:
            for name in os.listdir(assets_dir):
                if name.endswith(".langdata.json"):
                    code = name[:-len(".langdata.json")]
                    if code:
                        langs.add(code)
        except OSError:
            pass
    return tuple(sorted(langs))


def load_assets_dir(assets_dir: str | None) -> dict[str, frozenset]:
    """Load extra language stopword tables from ``assets_dir``
    (``<code>.langdata.json`` = {"stopwords": [...]}).  Deterministic;
    malformed files are skipped.  The runtime analogue of the
    reference's build-time asset download (``build.rs:480-515``)."""
    out: dict[str, frozenset] = {}
    if not assets_dir:
        return out
    import json
    import os

    try:
        names = sorted(os.listdir(assets_dir))
    except OSError:
        return out
    for name in names:
        if not name.endswith(".langdata.json"):
            continue
        code = name[:-len(".langdata.json")]
        try:
            with open(os.path.join(assets_dir, name)) as f:
                data = json.load(f)
            words = frozenset(str(w).lower() for w in data.get("stopwords", []))
            if code and words:
                out[code] = words
        except (OSError, json.JSONDecodeError, AttributeError):
            continue
    return out


_DEFAULT = None


def detect_lang(text: str, margin: int = 2) -> tuple[str, float]:
    """Module-level convenience using a shared default detector."""
    global _DEFAULT
    if _DEFAULT is None or _DEFAULT.margin != margin:
        _DEFAULT = LangDetector(margin=margin)
    return _DEFAULT.detect(text)


#: Script ranges for detect_script (the detect_os script_name analogue,
#: reference src/api.rs:599-629) — (name, regex of the script's block).
SCRIPT_RANGES: tuple = (
    ("Han", re.compile("[\u4E00-\u9FFF\u3400-\u4DBF]")),
    ("Hiragana", re.compile("[\u3040-\u309F]")),
    ("Katakana", re.compile("[\u30A0-\u30FF]")),
    ("Hangul", re.compile("[\uAC00-\uD7AF\u1100-\u11FF]")),
    ("Cyrillic", re.compile("[\u0400-\u04FF]")),
    ("Arabic", re.compile("[\u0600-\u06FF\u0750-\u077F]")),
    ("Hebrew", re.compile("[\u0590-\u05FF]")),
    ("Greek", re.compile("[\u0370-\u03FF]")),
    ("Devanagari", re.compile("[\u0900-\u097F]")),
    ("Thai", re.compile("[\u0E00-\u0E7F]")),
    ("Latin", re.compile("[A-Za-z\u00C0-\u024F]")),
)


def detect_script(text: str, sample: int = 1000) -> tuple[str, float]:
    """Dominant writing script by Unicode-range tallies → (script, conf).
    Deterministic: counts are integers, ties break by range order
    (more-specific scripts first); empty/none → ('Unknown', 0.0)."""
    s = text[:sample]
    best_name, best_n, total = "Unknown", 0, 0
    for name, rx in SCRIPT_RANGES:
        n = len(rx.findall(s))
        total += n
        if n > best_n:
            best_name, best_n = name, n
    if best_n == 0:
        return "Unknown", 0.0
    return best_name, best_n / total


_RTL_RE = re.compile("[\u0590-\u08FF\uFB1D-\uFDFF\uFE70-\uFEFF]")
_ALPHA_RE = re.compile(r"[^\W\d_]", re.UNICODE)


def text_direction(text: str, sample: int = 500) -> str:
    """'ltr' | 'rtl' from Unicode-range tallies (deterministic) —
    ``get_text_direction`` analogue (``src/api.rs:1017-1028``)."""
    s = text[:sample]
    rtl = len(_RTL_RE.findall(s))
    ltr = len(_ALPHA_RE.findall(s)) - rtl
    return "rtl" if rtl > ltr else "ltr"
