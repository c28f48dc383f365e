"""Vega runtime script tags for the standalone HTML surfaces.

The reference ships its dashboards with VENDORED vega/vega-lite/vega-embed
bundles inlined into the HTML (reference internals/cluster_studio.py
bundled template), so the pages render with no network. Those bundles are
not vendored in this repo (no network in the build environment), so the
default is CDN script tags — but air-gapped users can point ``inline_js``
at a local directory holding the three bundles and get the reference's
fully-offline behavior: the file contents are embedded into ``<script>``
blocks.

Get the bundles once with any package manager or
``curl -O https://cdn.jsdelivr.net/npm/vega@5/build/vega.min.js`` (and the
vega-lite@5 / vega-embed@6 equivalents) into a directory.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

_CDN_TAGS = {
    "vega": '<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>',
    "vega-lite": (
        '<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>'
    ),
    "vega-embed": (
        '<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>'
    ),
}

# accepted filenames per library, probed in order
_INLINE_FILENAMES = {
    "vega": ("vega.min.js", "vega.js"),
    "vega-lite": ("vega-lite.min.js", "vega-lite.js"),
    "vega-embed": ("vega-embed.min.js", "vega-embed.js"),
}


def vega_script_tags(
    libs: Sequence[str] = ("vega", "vega-lite", "vega-embed"),
    inline_js: Optional[str] = None,
) -> str:
    """Script tags loading the requested Vega libraries.

    ``inline_js=None`` (default): CDN ``<script src=...>`` tags — the page
    needs network the first time a browser renders it.
    ``inline_js="/path/to/dir"``: the bundle files are read from that
    directory and EMBEDDED, producing a fully-offline page (reference
    parity). Raises ``FileNotFoundError`` naming the missing file and the
    accepted filenames if a bundle is absent — a silent CDN fallback would
    defeat the point for air-gapped users.
    """
    if inline_js is None:
        return "\n  ".join(_CDN_TAGS[lib] for lib in libs)
    tags = []
    for lib in libs:
        path = None
        for fn in _INLINE_FILENAMES[lib]:
            cand = os.path.join(inline_js, fn)
            if os.path.isfile(cand):
                path = cand
                break
        if path is None:
            raise FileNotFoundError(
                f"inline_js={inline_js!r}: no {lib} bundle found — expected "
                f"one of {list(_INLINE_FILENAMES[lib])}. Download with e.g. "
                f"curl -O https://cdn.jsdelivr.net/npm/{lib}@"
                f"{'6' if lib == 'vega-embed' else '5'}/build/{lib}.min.js"
            )
        with open(path, encoding="utf-8") as f:
            content = f.read()
        # a literal </script> inside the bundle would end the block early
        content = content.replace("</script", "<\\/script")
        tags.append(f"<script>\n{content}\n</script>")
    return "\n  ".join(tags)
