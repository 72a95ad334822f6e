"""Engine operators: URL-seen membership (axis A), politeness/budget/skew
(axis B), priority scoring, dedup families, top-k similarity, MERGE-style
table mutations.  Everything is DataFrame-first; Python appears only inside
Arrow-batched pandas UDFs.
"""
