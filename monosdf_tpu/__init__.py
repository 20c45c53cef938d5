"""monosdf_tpu — a TPU-native (JAX/XLA/Pallas) neural implicit surface
reconstruction framework with the capabilities of MonoSDF (reference:
Jerrypiglet/monosdf).

Design stance: pure-functional JAX. Parameters are pytrees (nested dicts),
randomness is explicit `jax.random` keys, every hot path is static-shape and
jit-compiled, scale-out is `jax.sharding.Mesh` + `shard_map` with XLA
collectives over ICI.
"""

__version__ = "0.1.0"
