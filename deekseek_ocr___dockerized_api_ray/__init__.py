"""Ray-Data-native document-extraction engine.

A brand-new engine (NOT a port) with the extraction capabilities of the
reference repo `thijse/DeekSeek-OCR---Dockerized-API`: interleaved
text+media documents flow through a streaming `ray.data.Dataset`
pipeline (explode spans -> stateful OCR actor pool -> keyed reassembly
-> finalize/clean), reproducing the reference's per-document extracted
text under span-sequence equality (kind, text, media_ref, order).

Layout:
  functions/  pure deterministic transforms (cleaning, tiling, grounding,
              text stats, hashing) -- byte-exact vs the reference semantics
  sources/    synthetic interleaved corpus generator + readers
  stages/     map_batches stages (explode, OCR actor pool, reassemble,
              dedup, similarity, multimodal)
  pipelines/  end-to-end pipelines (extract flagship, relational demos)
  state/      checkpoint manifest + lineage for resumable runs
"""

__version__ = "0.1.0"
