from .torch_import import convert_state_dict, load_torch_checkpoint
from .torch_export import export_state_dict, save_torch_checkpoint
from .serving import export_predict, load_serving, save_serving
