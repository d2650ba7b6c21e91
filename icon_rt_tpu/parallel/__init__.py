from . import sharded
