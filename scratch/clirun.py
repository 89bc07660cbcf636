import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from sbwt_tpu.cli import main
sys.exit(main(sys.argv[1:]))
