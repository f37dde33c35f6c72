from npp_tpu.data.lip import FastLIPDataset, LIPDataset  # noqa: F401
from npp_tpu.data.loader import DataLoader, collate, make_target_renderer  # noqa: F401
from npp_tpu.data.pascal import PPPDataset  # noqa: F401
from npp_tpu.data.synthetic import SyntheticDataset  # noqa: F401
