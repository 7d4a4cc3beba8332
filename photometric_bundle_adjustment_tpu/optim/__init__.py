from photometric_bundle_adjustment_tpu.optim.lm import LMConfig, LMResult, lm_solve  # noqa: F401
