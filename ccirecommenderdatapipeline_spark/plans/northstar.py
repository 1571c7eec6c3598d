"""North-star surface index (BASELINE.json): the training-data-pipeline
operators live in their own modules —

- text analysis + dedup (exact / n-gram Jaccard / MinHash+LSH / SimHash /
  fingerprints / clustering): ``plans/text.py``
- similarity search (brute-force kNN, IVF ANN, cosine dedup):
  ``plans/vectors.py``
- multimodal binary columns: ``plans/multimodal.py``
- MLlib featurization/modeling: ``plans/mllib.py``
- event-time windows + streaming: ``plans/streaming.py``

See COVERAGE.md for the full operator -> query map.
"""
