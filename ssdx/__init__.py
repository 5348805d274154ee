"""ssdx — TPU-native SSD300 object-detection framework (JAX/XLA/Pallas/pjit).

A ground-up rebuild of the capabilities of
``ElliotBlackstone/automotive-ssd-object-detection`` designed for TPU:
functional core over pytrees, fixed shapes, batch-vectorized detection math,
jitted train/eval/predict steps, data-parallel by default over a device mesh.
"""

__version__ = "0.1.0"
