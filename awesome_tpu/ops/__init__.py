from awesome_tpu.ops.crf import CRFOptions, dense_crf  # noqa: F401
