"""Pure numpy/python kernels with the reference's exact semantics.

No Ray imports here — these are shared between the distributed engine
(inside map_batches / map_groups) and the single-process test oracles.
"""
