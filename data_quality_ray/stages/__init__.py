"""Pipeline stages: pure ``pa.Table -> pa.Table`` functions (stateless) and
callable classes (stateful actor-pool stages) for ``Dataset.map_batches``.

The two-facade extension seam mirrors the reference's
``annotator_agreement.quality`` / ``timeseries.features`` swap-in points
(SURVEY.md §2.10): quality estimators (langid, perplexity, decision) and
featurizers (decode, rules) are all just map_batches-compatible callables.
"""
