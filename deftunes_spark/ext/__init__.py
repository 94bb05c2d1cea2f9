"""North-star scale-out operators (BASELINE.json):

- ``dedup``       exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``  brute-force + LSH-bucketed cosine ANN over embeddings
- ``text``        language-ID, quality scoring, token counts, fingerprints
- ``multimodal``  opaque binary columns + typed metadata, Arrow-batched
                  decode/feature plumbing (decode itself stubbed — no
                  image/audio libs in this container)

Everything here is DataFrame-first and designed for 100 TB: candidate
generation always goes through hash-bucket joins (never an O(n²)
cross join), hot paths stay in built-in functions/codegen, and the
only Python is Arrow-batched ``mapInPandas`` where Spark genuinely
lacks the operator.
"""
