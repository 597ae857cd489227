"""paradis_tpu — TPU-native JAX rebuild of the PARADIS weather-forecasting framework.

A from-scratch jax/XLA/pallas/pjit implementation of the capabilities of
Wx-Alliance-Alliance-Meteo/paradis_model (reference mounted read-only at
/root/reference): an ERA5/WeatherBench-2 data pipeline, a physics-inspired
latent advection–diffusion–reaction network with a learned spherical
semi-Lagrangian advection operator and geocyclic padding, multi-step
autoregressive rollout training with weighted reversed-Huber/MSE/AMSE losses,
Muon/NorMuon optimization, and 10-day forecast inference written to
WB2-layout zarr stores.

Design notes (TPU-first, not a port):
  * arrays are channels-last ``[batch, lat, lon, channel]`` (lane dim = channels),
  * the per-layer physics loop is a fully-unrolled Python loop under
    ``nn.map_variables`` (stored params stay stacked ``[L, ...]``; ``nn.scan``
    is the opt-in compile-time lever) with optional rematerialisation,
  * the semi-Lagrangian gather-interpolate runs as a Pallas TPU kernel with a
    pure-XLA ``take_along_axis`` fallback,
  * parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding and
    XLA GSPMD collectives (no hand-written NCCL/MPI analogue).
"""

__version__ = "0.1.0"
