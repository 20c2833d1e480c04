"""Generate the vendored wikitext2-style corpus fixture, deterministically.

The environment has no egress, so the golden-number study
(`tools/reproduce_study.py`) cannot download real WikiText-2. This script
fabricates a corpus with the SAME surface artifacts as wikitext-2-raw —
` = Title = ` headings, ` @-@ `/` @,@ `/` @.@ ` escapes, space-separated
punctuation, ` 's` clitics, quoted/parenthesized spans — so the
detokenizer (`eval/harness/tasks/wikitext.py`), the `"\n\n"` document
join, and the calibration sampling RNG in `eval/data.py` are all
exercised end-to-end with numbers that are reproducible everywhere.

Run (only to regenerate; the output is checked in):
    python tools/make_fixture_corpus.py
writes tests/fixtures/wikitext2_slice.txt (~300 KB).
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "wikitext2_slice.txt",
)

NOUNS = """river valley castle treaty army village church council season match
force bridge empire harbour railway species garrison festival parish author
record island museum border monarch vessel regiment chapter colony
engine tower market script singer province canal squadron poem strike summit
""".split()
ADJS = """northern ancient coastal narrow fortified prominent disputed rural
imperial modest gothic volcanic annual decisive brief celebrated obscure
wooden restored derelict migratory sovereign baroque inland maritime
""".split()
VERBS = """crossed rebuilt defended annexed commissioned surveyed abandoned
depicted restored garrisoned chronicled disputed toured premiered excavated
settled flooded besieged chartered translated
""".split()
NAMES = """Aldermere Bexley Corvane Dunharrow Eastwick Farrow Greywall Halden
Ilsford Jorvik Keswick Lunden Marlow Norwich Ostmere Pelham Quarrington
Ravensholt Stanmoor Thornbury
""".split()


def _number(rng) -> str:
    kind = rng.integers(0, 4)
    if kind == 0:  # large with @,@ separator
        return f"{rng.integers(1, 999)} @,@ {rng.integers(0, 999):03d}"
    if kind == 1:  # decimal with @.@
        return f"{rng.integers(0, 99)} @.@ {rng.integers(0, 9)}"
    if kind == 2:  # hyphenated compound
        return f"{rng.integers(1, 99)} @-@ year @-@ old"
    return str(rng.integers(1, 1900))


def _sentence(rng) -> str:
    n = lambda: NOUNS[rng.integers(0, len(NOUNS))]
    a = lambda: ADJS[rng.integers(0, len(ADJS))]
    v = lambda: VERBS[rng.integers(0, len(VERBS))]
    nm = lambda: NAMES[rng.integers(0, len(NAMES))]
    forms = [
        lambda: f"The {a()} {n()} was {v()} in {_number(rng)} by {nm()}",
        lambda: f"{nm()} 's {n()} {v()} the {n()} near {nm()}",
        lambda: f"In {_number(rng)} , the {n()} of {nm()} was {v()} and later {v()}",
        lambda: f'Contemporary accounts describe it as " a {a()} {n()} of the {a()} school "',
        lambda: f"The {n()} ( also known as the {nm()} {n()} ) {v()} about {_number(rng)} members",
        lambda: f"It measures {_number(rng)} metres and holds {_number(rng)} seats",
    ]
    s = forms[rng.integers(0, len(forms))]()
    return s + " . "


def _article(rng, idx: int) -> str:
    title = f"{NAMES[rng.integers(0, len(NAMES))]} {NOUNS[rng.integers(0, len(NOUNS))]}"
    lines = [f" = {title} = \n", " \n"]
    for sec in range(int(rng.integers(2, 5))):
        if sec:
            sub = f"{ADJS[rng.integers(0, len(ADJS))]} history"
            lines += [f" = = {sub.title()} = = \n", " \n"]
        para = "".join(_sentence(rng) for _ in range(int(rng.integers(4, 10))))
        lines += [" " + para.rstrip() + " \n", " \n"]
    return "".join(lines)


def main() -> None:
    rng = np.random.default_rng(20260820)
    parts = []
    size = 0
    i = 0
    while size < 300_000:
        art = _article(rng, i)
        parts.append(art)
        size += len(art)
        i += 1
    text = "".join(parts)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {OUT}: {len(text)} bytes, {i} articles")


if __name__ == "__main__":
    main()
