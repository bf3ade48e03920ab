from .params import get_num_parameters, get_num_parameters_no_embed

__all__ = ["get_num_parameters", "get_num_parameters_no_embed"]
