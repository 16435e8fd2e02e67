from sivae_tpu.data.catalog import CLASS_MAP, load_data  # noqa: F401
from sivae_tpu.data.preprocess import preprocess_batch, preprocess_voxel_np  # noqa: F401
from sivae_tpu.data.synthetic import synthetic_brain_batch, SyntheticBrainSource  # noqa: F401
from sivae_tpu.data.pipeline import BrainDataSource, DataPipeline, grouped_split  # noqa: F401
from sivae_tpu.data.dict_dataset import BrainData  # noqa: F401
