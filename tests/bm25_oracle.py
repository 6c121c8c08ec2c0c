"""Independent scalar BM25 reference (numpy, no Spark) — FIXTURES.md §3.

Canonical accumulation order: per doc, contributions are summed in ascending
term order (float64). Tie-break: score DESC, doc_id ASC. The Spark exhaustive
path and the WAND path must both be rank-identical to this.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Tuple

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: List[Tuple[int, List[str]]]):
        """docs: [(doc_id, tokens)]"""
        self.tf: Dict[int, Counter] = {d: Counter(t) for d, t in docs}
        self.dl: Dict[int, int] = {d: len(t) for d, t in docs}
        self.df: Counter = Counter()
        self.postings: Dict[str, list] = defaultdict(list)
        for d, _ in docs:
            for term in self.tf[d]:
                self.df[term] += 1
                self.postings[term].append(d)
        self.n = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n) if self.n else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def topk(self, terms: List[str], k: int = 10) -> List[Tuple[int, float]]:
        # unique terms, ascending order for canonical summation
        uniq = sorted(set(terms))
        scores: Dict[int, float] = defaultdict(float)
        for t in uniq:
            if t not in self.postings:
                continue
            idf = self.idf(t)
            for d in self.postings[t]:
                tf = float(self.tf[d][t])
                dl = self.dl[d]
                norm = K1 * (1.0 - B + B * dl / self.avgdl)
                scores[d] += idf * tf * (K1 + 1.0) / (tf + norm)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
