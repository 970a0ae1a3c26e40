from aasist_tpu.data.protocol import (  # noqa: F401
    parse_protocol, ProtocolEntry, trial_metadata)
from aasist_tpu.data.dataset import (  # noqa: F401
    pad_to_fixed, pad_random, dynamic_chunk, bucket_lengths,
    AudioStore, EvalBatcher, TrainBatcher)
