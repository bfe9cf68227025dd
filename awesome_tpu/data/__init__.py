from awesome_tpu.data.convexity import ConvexityDataset  # noqa: F401
from awesome_tpu.data.synthetic import synthetic_convexity_dataset  # noqa: F401
from awesome_tpu.data.split import split_indices  # noqa: F401
from awesome_tpu.data.batching import pad_points, bucket_size  # noqa: F401
