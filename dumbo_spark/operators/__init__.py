"""Operator library — dumbo's stdlib and idioms, re-expressed Spark-first.

Each module maps a slice of the reference surface (SURVEY.md §2):

    agg.py        — sumreducer/sumsreducer/statsreducer family
                    (dumbo/lib/__init__.py), multicount/itertwice idioms
    shape.py      — mapper idioms: project/explode/filter/parse
                    (dumbo/core.py itermap; examples/excludewords.py)
    setops.py     — input union / MultiMapper (dumbo/core.py -input,
                    dumbo/lib MultiMapper) + intersect/except gap rows
    topk.py       — nlargest/nsmallest reducers (dumbo/lib) as windows
    joins.py      — JoinReducer / -cachefile map-side join (dumbo/lib)
    events.py     — event-time windows (absent in dumbo; gap rows)
    textstats.py  — wordcount/ngramcount idioms + text-analysis
                    extensions (lang-id, quality, fingerprints)
    dedup.py      — exact + MinHash-LSH / SimHash near-dup (north star)
    similarity.py — cosine top-k / LSH ANN over embeddings (north star)
    multimodal.py — binary-column plumbing with Arrow-batched UDFs
"""
