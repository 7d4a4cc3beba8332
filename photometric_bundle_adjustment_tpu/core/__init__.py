from photometric_bundle_adjustment_tpu.core import se3, cameras  # noqa: F401
