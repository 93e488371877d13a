"""Small shared helpers (path resolution)."""

from __future__ import annotations

import os

PKG_PFX = "pkg://"


def resolve_pkg_path(uri: str, search_dirs: tuple[str, ...] = ()) -> str:
    """Resolve a ``pkg://dotted.module.path.file.ext`` URI to a
    filesystem path (reference ``utils.py:10-33``).

    Resolution order: importlib.resources on the leading package, then a
    basename lookup through ``search_dirs`` — the fallback that lets
    configs authored against a package that is not installed here (e.g.
    the reference's own ``MEDS_transforms.…`` example URIs) resolve
    against a local directory. Non-``pkg://`` strings pass through.
    """
    if not uri.startswith(PKG_PFX):
        return uri
    dotted = uri[len(PKG_PFX) :]
    if "." not in dotted:
        # A dotless URI can't name a resource file — report it as the
        # documented FileNotFoundError, not an unpacking ValueError.
        raise FileNotFoundError(
            f"Cannot resolve {uri!r}: pkg:// URIs take the form "
            "pkg://package.subdirs.name.ext"
        )
    stem, ext = dotted.rsplit(".", 1)
    parts = stem.split(".")
    if len(parts) >= 2:  # pkg://pkg.name.ext at minimum for an ir lookup
        try:
            import importlib.resources as ir

            cand = ir.files(parts[0]).joinpath("/".join(parts[1:]) + "." + ext)
            if cand.is_file():
                return str(cand)
        except (ImportError, ModuleNotFoundError, TypeError, AttributeError):
            pass
    fname = parts[-1] + "." + ext
    for d in search_dirs:
        cand = os.path.join(d, fname)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"Cannot resolve {uri!r} (searched {list(search_dirs)})")
