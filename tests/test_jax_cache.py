"""utils/jax_cache.ensure_compilation_cache.

The env-var-only convention silently fails when sitecustomize preloads
jax before user code sets ``JAX_COMPILATION_CACHE_DIR`` (the config
value latches at import). The helper must route through jax.config and
must never override a directory the user already configured there.
"""
import os

import jax

from human_pose_estimation_tpu.utils.jax_cache import (
    DEFAULT_CACHE_DIR,
    ensure_compilation_cache,
)


def _restore(prev_cfg, prev_env):
    jax.config.update("jax_compilation_cache_dir", prev_cfg)
    if prev_env is None:
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    else:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = prev_env


def test_sets_config_when_unset(tmp_path):
    prev_cfg = jax.config.jax_compilation_cache_dir
    prev_env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
        path = ensure_compilation_cache()
        assert path == DEFAULT_CACHE_DIR
        assert jax.config.jax_compilation_cache_dir == DEFAULT_CACHE_DIR
    finally:
        _restore(prev_cfg, prev_env)


def test_env_var_wins_even_after_jax_import(tmp_path):
    """The sitecustomize scenario: jax imported first, env var set later."""
    prev_cfg = jax.config.jax_compilation_cache_dir
    prev_env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        os.environ["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "envcache")
        path = ensure_compilation_cache()
        assert path == str(tmp_path / "envcache")
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        _restore(prev_cfg, prev_env)


def test_never_overrides_user_config(tmp_path):
    prev_cfg = jax.config.jax_compilation_cache_dir
    prev_env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    try:
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "user"))
        path = ensure_compilation_cache()
        assert path == str(tmp_path / "user")
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "user")
    finally:
        _restore(prev_cfg, prev_env)


def test_explicit_path_argument(tmp_path):
    prev_cfg = jax.config.jax_compilation_cache_dir
    prev_env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
        path = ensure_compilation_cache(str(tmp_path / "explicit"))
        assert path == str(tmp_path / "explicit")
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        _restore(prev_cfg, prev_env)
