from sls_tpu.data.protocols import (
    ProtocolEntry,
    parse_eval_list,
    parse_train_protocol,
)
from sls_tpu.data.audio import pad_or_tile

__all__ = [
    "ProtocolEntry",
    "parse_eval_list",
    "parse_train_protocol",
    "pad_or_tile",
]
