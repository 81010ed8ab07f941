"""Porter stemmer — implemented from the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980;
public domain algorithm). Original-paper rule set, longest-match-per-step
semantics.

This is the `english_stemmer` the reference's analyzer declares at
/root/reference/wapo/index_es.py:71-74,87 (Lucene's PorterStemFilter).
Pure function — shared by the Spark pandas-UDF analyzer and the pure
oracle; memoize at the call site for corpus-scale use.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]."""
    n = 0
    i = 0
    L = len(w)
    while i < L and _is_cons(w, i):
        i += 1
    while True:
        while i < L and not _is_cons(w, i):
            i += 1
        if i >= L:
            break
        n += 1
        while i < L and _is_cons(w, i):
            i += 1
    return n


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest(word: str, suffixes) -> str | None:
    best = None
    for s in suffixes:
        suf = s[0] if isinstance(s, tuple) else s
        if word.endswith(suf) and (best is None or len(suf) > len(best[0] if isinstance(best, tuple) else best)):
            best = s
    return best


def stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    hit = _longest(w, _STEP2)
    if hit is not None:
        suf, rep = hit
        stem_ = w[: -len(suf)]
        if _measure(stem_) > 0:
            w = stem_ + rep

    # Step 3
    hit = _longest(w, _STEP3)
    if hit is not None:
        suf, rep = hit
        stem_ = w[: -len(suf)]
        if _measure(stem_) > 0:
            w = stem_ + rep

    # Step 4
    hit = _longest(w, _STEP4)
    if hit is not None:
        stem_ = w[: -len(hit)]
        if _measure(stem_) > 1:
            if hit == "ion":
                if stem_.endswith(("s", "t")):
                    w = stem_
            else:
                w = stem_

    # Step 5a
    if w.endswith("e"):
        stem_ = w[:-1]
        m = _measure(stem_)
        if m > 1 or (m == 1 and not _cvc(stem_)):
            w = stem_

    # Step 5b
    if _measure(w) > 1 and w.endswith("ll"):
        w = w[:-1]

    return w
