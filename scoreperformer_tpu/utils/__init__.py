from .functions import (
    ExplicitEnum,
    apply,
    default,
    exists,
    find_closest,
    or_reduce,
    prob2bool,
)
from .cache import enable_compile_cache, host_cache_dir
from .io import dump_json, load_json
