from .pipeline import cycle, prefetch_to_device  # noqa: F401
from .synthetic import SyntheticAnomalyDataset, SyntheticMRIDataset  # noqa: F401
