"""DataFrame-level operators — the engine's stages and reusable relational
building blocks. Everything here is declarative Spark (Catalyst-optimizable)
plus Arrow-batched pandas UDFs for the extraction kernels in ``..functions``.
"""
