from . import distributed
from .sharding import make_mesh, render_sharded, train_step_sharded
