from tsue_tpu.data.filters import (
    check_data_sanity,
    filter_context,
    parse_lane_from_context,
    get_polygon_from_lane_roi,
    is_trajectory_abnormal,
)
from tsue_tpu.data.windowing import build_windows, WindowedDataset
from tsue_tpu.data.tokenizer import ByteTokenizer, get_tokenizer
from tsue_tpu.data.schema import (
    split_tracks,
    load_lane_roi,
    load_vendored_lane_roi,
    make_synthetic_tracks,
    make_synthetic_lane_roi,
)
from tsue_tpu.data.dataset import BatchIterator, pad_to_multiple
