"""Captioning metrics: BLEU-1..4 and CIDEr-D.

Own implementations of the standard published algorithms the reference
pulls from pycocoevalcap (ref Emu1/mm_eval/datasets/coco.py:95-129):
corpus BLEU with brevity penalty and per-n clipped precision, and CIDEr-D
(tf-idf-weighted n-gram cosine similarity with length penalty, n=1..4,
sigma=6).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

_PUNCT = re.compile(r"[^\w\s]")


def tokenize(s: str) -> List[str]:
    """PTB-lite tokenization: lowercase, strip punctuation, split."""
    return _PUNCT.sub("", s.lower()).split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu(results: Dict[str, str], refs: Dict[str, List[str]],
         max_n: int = 4) -> List[float]:
    """Corpus-level BLEU-1..max_n. results: id → hypothesis;
    refs: id → list of references."""
    clipped = [0] * max_n
    total = [0] * max_n
    hyp_len = ref_len = 0
    for key, hyp in results.items():
        h = tokenize(hyp)
        rs = [tokenize(r) for r in refs[key]]
        hyp_len += len(h)
        ref_len += min((abs(len(r) - len(h)), len(r)) for r in rs)[1]
        for n in range(1, max_n + 1):
            hc = _ngrams(h, n)
            max_ref = Counter()
            for r in rs:
                for g, c in _ngrams(r, n).items():
                    max_ref[g] = max(max_ref[g], c)
            clipped[n - 1] += sum(min(c, max_ref[g]) for g, c in hc.items())
            total[n - 1] += max(sum(hc.values()), 0)
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    scores = []
    log_sum = 0.0
    for n in range(max_n):
        p = clipped[n] / total[n] if total[n] > 0 else 0.0
        log_sum += math.log(max(p, 1e-12))
        scores.append(bp * math.exp(log_sum / (n + 1)))
    return scores


def cider_d(results: Dict[str, str], refs: Dict[str, List[str]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D over the result corpus (document frequencies from refs)."""
    ids = list(results.keys())
    ref_tokens = {k: [tokenize(r) for r in refs[k]] for k in ids}
    hyp_tokens = {k: tokenize(results[k]) for k in ids}

    # document frequency per n-gram (over reference *sets*)
    df = [defaultdict(float) for _ in range(max_n)]
    for k in ids:
        for n in range(max_n):
            seen = set()
            for r in ref_tokens[k]:
                seen |= set(_ngrams(r, n + 1).keys())
            for g in seen:
                df[n][g] += 1.0
    log_n_docs = math.log(max(len(ids), 1))

    def tfidf_vec(tokens):
        vecs, norms, length = [], [], len(tokens)
        for n in range(max_n):
            counts = _ngrams(tokens, n + 1)
            vec = {}
            norm = 0.0
            for g, c in counts.items():
                idf = log_n_docs - math.log(max(df[n][g], 1.0))
                w = c * idf
                vec[g] = w
                norm += w * w
            vecs.append(vec)
            norms.append(math.sqrt(norm))
        return vecs, norms, length

    def sim(hv, hn, hl, rv, rn, rl):
        score = 0.0
        delta = hl - rl
        for n in range(max_n):
            s = sum(min(hv[n].get(g, 0.0), rv[n][g]) * rv[n][g]
                    for g in rv[n])
            if hn[n] > 0 and rn[n] > 0:
                s /= hn[n] * rn[n]
            s *= math.exp(-delta ** 2 / (2 * sigma ** 2))
            score += s
        return score / max_n

    total = 0.0
    for k in ids:
        hv, hn, hl = tfidf_vec(hyp_tokens[k])
        s = 0.0
        for r in ref_tokens[k]:
            rv, rn, rl = tfidf_vec(r)
            s += sim(hv, hn, hl, rv, rn, rl)
        total += 10.0 * s / max(len(ref_tokens[k]), 1)
    return total / max(len(ids), 1)


def rouge_l(results: Dict[str, str], refs: Dict[str, List[str]],
            beta: float = 1.2) -> float:
    """ROUGE-L F-measure (LCS-based), max over references per sample."""

    def lcs(a: List[str], b: List[str]) -> int:
        dp = [0] * (len(b) + 1)
        for x in a:
            prev = 0
            for j, y in enumerate(b, 1):
                cur = dp[j]
                dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
                prev = cur
        return dp[-1]

    total = 0.0
    for k, hyp in results.items():
        h = tokenize(hyp)
        best = 0.0
        for ref in refs[k]:
            r = tokenize(ref)
            l = lcs(h, r)
            if l == 0 or not h or not r:
                continue
            p, rec = l / len(h), l / len(r)
            best = max(best, (1 + beta ** 2) * p * rec
                       / (rec + beta ** 2 * p))
        total += best
    return total / max(len(results), 1)


def _stemmer():
    try:
        from nltk.stem.porter import PorterStemmer
        return PorterStemmer().stem
    except Exception:  # noqa: BLE001
        return lambda w: w


def _meteor_align(hyp: List[str], ref: List[str], stem) -> Tuple[int, int]:
    """Greedy staged unigram alignment (exact, then stem) → (matches,
    chunks). Matching per stage pairs each unmatched hypothesis word with
    the first unmatched reference word of the same surface (then stem)
    form; chunks = maximal runs of adjacent (hyp, ref) index pairs —
    the Banerjee & Lavie (2005) fragmentation measure."""
    pairs = []
    h_free = list(range(len(hyp)))
    r_free = list(range(len(ref)))
    for key in (lambda w: w, stem):
        r_by_key: Dict[str, List[int]] = defaultdict(list)
        for j in r_free:
            r_by_key[key(ref[j])].append(j)
        still = []
        # reverse scan, taking the LAST unmatched reference occurrence —
        # the exact greedy order of the published implementation (and
        # nltk's), which the oracle test pins to
        for i in reversed(h_free):
            cands = r_by_key.get(key(hyp[i]))
            if cands:
                pairs.append((i, cands.pop()))
            else:
                still.append(i)
        h_free = still[::-1]
        r_free = [j for j in r_free if j not in {p[1] for p in pairs}]
    if not pairs:
        return 0, 0
    pairs.sort()
    chunks = 1
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    return len(pairs), chunks


def meteor(results: Dict[str, str], refs: Dict[str, List[str]], *,
           alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5
           ) -> float:
    """Corpus METEOR (mean of per-sample max-over-references scores).

    Implements the published METEOR algorithm (Banerjee & Lavie 2005)
    with exact + Porter-stem matching stages and the standard
    parametrized harmonic mean / fragmentation penalty (alpha=.9, beta=3,
    gamma=.5 — the NLTK defaults). The reference's pycocoevalcap METEOR
    1.5 additionally uses WordNet synonym/paraphrase tables (a bundled
    Java jar, ref Emu1/mm_eval/datasets/coco.py:95-129); those corpus
    files are not in this image, so scores are the exact+stem subset —
    systematically close but not bit-identical to the jar."""
    stem = _stemmer()
    total = 0.0
    for k, hyp in results.items():
        h = tokenize(hyp)
        best = 0.0
        for ref in refs[k]:
            r = tokenize(ref)
            m, chunks = _meteor_align(h, r, stem)
            if m == 0 or not h or not r:
                continue
            p, rec = m / len(h), m / len(r)
            fmean = p * rec / (alpha * p + (1 - alpha) * rec)
            frag = gamma * (chunks / m) ** beta
            best = max(best, fmean * (1.0 - frag))
        total += best
    return total / max(len(results), 1)


# SPICE note: the reference's SPICE metric is a Java scene-graph parser
# (Stanford CoreNLP dependency trees → semantic propositions). Neither the
# JVM toolchain nor the CoreNLP models exist in this image and the
# algorithm is not reimplementable faithfully without them. spice_lite
# below is a documented graph-free approximation; the faithful four
# n-gram/alignment metrics (BLEU/METEOR/ROUGE-L/CIDEr) remain the
# comparable set (e.g. nocaps leaderboard).

# function words excluded from SPICE-lite propositions (SPICE drops
# non-content dependency nodes; this is the parse-free analogue)
_STOP = frozenset(
    "a an the of in on at to for with and or is are was were be been "
    "being this that these those there it its his her their our your my "
    "as by from into onto over under up down out off about than then "
    "very some any each both all no not has have had do does did".split())


def _propositions(tokens: List[str], stem) -> set:
    """Parse-free proposition set: stemmed content words (SPICE object
    tuples) + near-adjacent content-word pairs, skipping up to TWO
    function words — preposition+article relations are the commonest
    SPICE relation shape ('man ON A horse' → (man, horse), gap 3) — the
    attribute/relation tuple analogue."""
    content = [(i, stem(t)) for i, t in enumerate(tokens)
               if t not in _STOP]
    props = {(w,) for _, w in content}
    for (i, a), (j, b) in zip(content, content[1:]):
        if j - i <= 3:                    # adjacent or <=2 function words
            props.add((a, b))
    return props


def spice_lite(results: Dict[str, str], refs: Dict[str, List[str]]
               ) -> float:
    """Graph-free SPICE approximation (documented stand-in, NOT the
    published metric): per-sample F1 between the candidate's proposition
    set and the union of the references' sets (SPICE merges all
    references into one scene graph before matching), averaged over the
    corpus. Propositions are stemmed content-word unigrams + near-
    adjacent pairs instead of CoreNLP dependency tuples; scores track
    SPICE's ranking behavior (semantic-content overlap, order-
    insensitive beyond adjacency) but are not numerically comparable to
    pycocoevalcap SPICE (ref Emu1/mm_eval/datasets/coco.py:95-129)."""
    stem = _stemmer()
    total = 0.0
    for k, hyp in results.items():
        cand = _propositions(tokenize(hyp), stem)
        ref = set()
        for r in refs[k]:
            ref |= _propositions(tokenize(r), stem)
        if not cand or not ref:
            continue
        tp = len(cand & ref)
        if tp == 0:
            continue
        p, rec = tp / len(cand), tp / len(ref)
        total += 2 * p * rec / (p + rec)
    return total / max(len(results), 1)


def evaluate_captions(results: List[Dict], refs: Dict[str, List[str]]
                      ) -> Dict[str, float]:
    """results: [{image_id, caption}]; refs: image_id → gt captions."""
    res = {str(r["image_id"]): r["caption"] for r in results
           if str(r["image_id"]) in refs}
    use_refs = {k: refs[k] for k in res}
    b = bleu(res, use_refs)
    return {"BLEU-1": 100 * b[0], "BLEU-4": 100 * b[3],
            "METEOR": 100 * meteor(res, use_refs),
            "CIDEr": 100 * cider_d(res, use_refs),
            "ROUGE-L": 100 * rouge_l(res, use_refs),
            "SPICE-lite": 100 * spice_lite(res, use_refs), "n": len(res)}
