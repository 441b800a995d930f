from .end2end import detxy_for_obsid, run_end2end
from .onnx_import import import_onnx_params, read_onnx_initializers
from .run_file import InferenceEngine, infer_file

__all__ = [
    "InferenceEngine", "detxy_for_obsid", "import_onnx_params", "infer_file",
    "read_onnx_initializers", "run_end2end",
]
