"""Deterministic synthetic world: images, pages, site graphs.

No external data and no image libraries — PNG via a pure-zlib encoder,
perceptual hash via a numpy DCT.  Everything is seeded so the Spark engine
and the pure-Python oracle observe byte-identical pages and pixels.
"""
