from .torch_import import convert_state_dict, load_torch_checkpoint
