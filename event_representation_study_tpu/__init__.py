"""TPU-native event-representation study framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
uzh-rpg/event_representation_study (ICCV 2023, "From Chaos Comes Order"):

- ``events``  — event-stream structures, HDF5 I/O, windowing, filters
- ``ops``     — scatter/segment primitives, boxes, NMS, image ops
- ``reps``    — event->tensor representations as fused on-device kernels
- ``metrics`` — Gromov-Wasserstein ranking + COCO detection metrics
- ``models``  — detector (CSP backbone / BiFPAN neck / decoupled head) + classifiers
- ``train``   — losses, assigners, EMA, optimizer, engines
- ``search``  — Bayesian-optimization representation search (Gryffin-equivalent)
- ``parallel``— mesh/sharding helpers, pjit train steps
- ``data``    — Gen1 / 1Mpx / N-ImageNet pipelines

The compute path is pure JAX (jit/vmap/pjit + Pallas kernels); everything is
static-shape and mask-based so the whole pipeline, raw events -> representation
-> detector -> loss, compiles to a single XLA program per step.
"""

__version__ = "0.1.0"
