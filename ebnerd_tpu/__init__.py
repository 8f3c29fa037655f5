"""ebnerd_tpu — a TPU-native news-recommendation framework for EB-NeRD.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference toolbox (ebanalyse/ebnerd-benchmark): data layer, newsrec model
family (NRMS, NRMSDocVec, LSTUR, NPA, NAML, Fastformer), training loop,
ranking + beyond-accuracy evaluation, and the CodaBench submission
protocol — re-designed TPU-first (SPMD meshes, fused kernels, dense
host->device input pipeline).
"""

__version__ = "0.1.0"
