from . import scatter
