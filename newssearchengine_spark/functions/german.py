"""German analysis chain: the ES built-in `german` analyzer, from scratch.

The reference indexes its netzpolitik corpus with ES's built-in `german`
analyzer (/root/reference/netzpolitik/index_es.py:56,66): standard
tokenizer -> lowercase -> German stoplist -> German normalization
(umlaut/ae-oe-ue folding, ss for eszett) -> German stemmer. The exact
semantics implemented here are pinned by the reference's OWN golden
fixtures — real analyzed keyword sets captured from a live ES at
/root/reference/test/netzpolitik/test_parse.py:40-104 (e.g.
Kartellbehörden -> kartellbehord, Besonders -> besond, Verfahren ->
verfahr) — and asserted in tests/test_german_analyzer.py.

The stemmer is the published light German stemmer (J. Savoy, "Light
stemming approaches for the French, Portuguese, German and Hungarian
languages", SAC 2006): two suffix-stripping passes over plural/case
endings with a valid-s-ending check. Pure function per token; applied
vectorized over Arrow batches by functions.analysis.
"""

from __future__ import annotations

import re

# Standard snowball German stopword list (public; the list ES's
# german_stop/_german_ uses). Matched on the LOWERCASED token BEFORE
# normalization — hence the umlauted spellings.
GERMAN_STOPWORDS: frozenset[str] = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das daß derselbe derselben
denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
deinem deinen deiner deines denn derer dessen dich dir du dies diese
diesem diesen dieser dieses doch dort durch ein eine einem einen einer
eines einig einige einigem einigen einiger einiges einmal er ihn ihm es
etwas euer eure eurem euren eurer eures für gegen gewesen hab habe haben
hat hatte hatten hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer
ihres euch im in indem ins ist jede jedem jeden jeder jedes jene jenem
jenen jener jenes jetzt kann kein keine keinem keinen keiner keines
können könnte machen man manche manchem manchen mancher manches mein
meine meinem meinen meiner meines mit muss musste nach nicht nichts noch
nun nur ob oder ohne sehr sein seine seinem seinen seiner seines selbst
sich sie ihnen sind so solche solchem solchen solcher solches soll
sollte sondern sonst über um und uns unsere unserem unseren unser
unseres unter viel vom von vor während war waren warst was weg weil
weiter welche welchem welchen welcher welches wenn werde werden wie
wieder will wir wird wirst wo wollen wollte würde würden zu zum zur
zwar zwischen
""".split())

# ES standard tokenizer approximation: maximal runs of unicode
# letters/digits (underscore excluded). Apostrophes split words
# (no possessive filter in the german chain).
WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)

_VOWELS = set("aeiouyäöü")

_S_ENDINGS = set("bdfghklmnrt")  # valid chars before a strippable final -s


def normalize_german(token: str) -> str:
    """German normalization (the german_normalization step): 'ß' -> 'ss',
    umlauts folded to base vowels, and the digraphs 'ae'/'oe' -> 'a'/'o';
    'ue' -> 'u' except directly after 'q' or a vowel (Treue, Queue keep
    their 'ue' — the snowball German2 exception)."""
    token = token.replace("ß", "ss")
    out = []
    i = 0
    n = len(token)
    while i < n:
        c = token[i]
        nxt = token[i + 1] if i + 1 < n else ""
        if c in "ao" and nxt == "e":
            out.append(c)
            i += 2
            continue
        if c == "u" and nxt == "e":
            prev = out[-1] if out else ""
            if prev != "q" and prev not in _VOWELS:
                out.append("u")
                i += 2
                continue
        if c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _step1(s: str) -> str:
    n = len(s)
    if n > 5 and s.endswith("ern"):
        return s[:-3]
    if n > 4 and s[-2] == "e" and s[-1] in "mnrs":
        return s[:-2]
    if n > 3 and s[-1] == "e":
        return s[:-1]
    if n > 3 and s[-1] == "s" and s[-2] in _S_ENDINGS:
        return s[:-1]
    return s


def _step2(s: str) -> str:
    n = len(s)
    if n > 5 and s.endswith("est"):
        return s[:-3]
    if n > 4 and s[-2] == "e" and s[-1] in "nr":
        return s[:-2]
    if n > 5 and s.endswith("st") and s[-3] in _S_ENDINGS:
        return s[:-2]
    return s


def stem_german(token: str) -> str:
    """Light German stemmer (Savoy 2006) over the normalized token:
    pass 1 strips plural/case endings (-ern/-em/-en/-er/-es/-e/-s),
    pass 2 strips a remaining derivational ending (-est/-er/-en/-st)."""
    return _step2(_step1(normalize_german(token)))


def analyze_german(text: str, stopwords: frozenset[str] = GERMAN_STOPWORDS
                   ) -> list[str]:
    """Full chain on one string (the pure-oracle form): tokenize ->
    lowercase -> stop -> normalize -> stem."""
    out = []
    for tok in WORD_RE.findall(text or ""):
        tok = tok.lower()
        if tok in stopwords:
            continue
        out.append(stem_german(tok))
    return out
