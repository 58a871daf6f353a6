"""Pure-Python schema lattice: derive / merge / finalize / render / validate.

No Ray dependency in this subpackage — it is the conformance core shipped
inside ``map_batches`` closures by the pipeline layer.
"""
