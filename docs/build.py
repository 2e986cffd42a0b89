#!/usr/bin/env python
"""Self-contained docs builder (no sphinx/docutils in the image).

The reference ships BUILT docs (its `docs/build/latex/` PDF is committed,
docs/source/index.rst:1-69); this repo has no sphinx available and cannot
pip-install one, so this builder renders the same artifact class with the
standard library only:

* `docs/source/index.rst` → `docs/build/html/index.html` via a minimal
  rst-subset renderer (sections, definition lists, literal blocks,
  ``inline literals``, `:math:` roles rendered as code);
* the `.. automodule::` directives → stdlib-`pydoc` HTML pages per module
  under `docs/build/html/api/`, linked from the index.

Run:  python docs/build.py     (or `make html` in docs/)
"""

from __future__ import annotations

import html
import pydoc
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
REPO = ROOT.parent
OUT = ROOT / "build" / "html"

STYLE = """
body { font-family: Georgia, serif; max-width: 46em; margin: 2em auto;
       padding: 0 1em; color: #222; line-height: 1.5; }
h1 { border-bottom: 2px solid #444; padding-bottom: .2em; }
h2 { border-bottom: 1px solid #bbb; padding-bottom: .15em; margin-top: 2em; }
code, pre { font-family: Menlo, Consolas, monospace; background: #f4f4f4; }
code { padding: .08em .25em; border-radius: 3px; }
pre { padding: .8em 1em; overflow-x: auto; border-left: 3px solid #999; }
dt { font-weight: bold; margin-top: 1em; }
dd { margin: .3em 0 .8em 1.6em; }
.math { font-style: italic; background: #f8f6ee; }
a { color: #1a4f8a; }
"""


def _inline(text: str) -> str:
    text = html.escape(text, quote=False)
    text = re.sub(r":math:`([^`]*)`", r'<code class="math">\1</code>', text)
    text = re.sub(r"``([^`]*)``", r"<code>\1</code>", text)
    return text


def rst_to_html(src: str, api_links: list) -> str:
    lines = src.splitlines()
    out = []
    i = 0
    in_dl = False

    def close_dl():
        nonlocal in_dl
        if in_dl:
            out.append("</dl>")
            in_dl = False

    while i < len(lines):
        line = lines[i]
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        # section headers (underline style)
        if line.strip() and re.fullmatch(r"[=\-~^]{3,}", nxt.strip() or "x"):
            close_dl()
            level = {"=": 1, "-": 2, "~": 3, "^": 4}[nxt.strip()[0]]
            out.append(f"<h{level}>{_inline(line.strip())}</h{level}>")
            i += 2
            continue
        # directives
        m = re.match(r"\.\.\s+(\w+)::\s*(.*)", line)
        if m:
            name, arg = m.group(1), m.group(2).strip()
            body = []
            i += 1
            while i < len(lines) and (
                not lines[i].strip() or lines[i].startswith(("   ", "\t"))
            ):
                body.append(lines[i])
                i += 1
            if name == "math":
                content = "\n".join(s.strip() for s in body if s.strip())
                out.append(f'<pre class="math">{html.escape(content)}</pre>')
            elif name == "automodule":
                members = ""
                for s in body:
                    mm = re.match(r"\s*:members:\s*(.*)", s)
                    if mm:
                        members = mm.group(1).strip()
                api_links.append((arg, members))
                page = arg + ".html"
                label = f"{arg}" + (f" — {members}" if members else "")
                out.append(
                    f'<p class="api">API: <a href="api/{page}">'
                    f"{html.escape(label)}</a></p>"
                )
            # other directives: drop silently
            continue
        # definition list item: term line followed by indented body
        if (
            line
            and not line.startswith((" ", "\t"))
            and nxt.startswith(("    ", "\t"))
        ):
            if not in_dl:
                out.append("<dl>")
                in_dl = True
            out.append(f"<dt>{_inline(line.strip())}</dt>")
            body = []
            i += 1
            while i < len(lines) and (
                not lines[i].strip() or lines[i].startswith(("    ", "\t"))
            ):
                body.append(lines[i])
                i += 1
            out.append("<dd>" + _render_body(body) + "</dd>")
            continue
        # paragraph
        if line.strip():
            close_dl()
            para = [line]
            i += 1
            while i < len(lines) and lines[i].strip() and not re.fullmatch(
                r"[=\-~^]{3,}", (lines[i + 1].strip() if i + 1 < len(lines) else "")
            ):
                if lines[i].startswith(".. "):
                    break
                para.append(lines[i])
                i += 1
            text = " ".join(s.strip() for s in para)
            if text.endswith("::"):
                text = text[:-2] + ":"
                out.append(f"<p>{_inline(text)}</p>")
                block = []
                while i < len(lines) and (
                    not lines[i].strip() or lines[i].startswith(("    ", "\t"))
                ):
                    block.append(lines[i])
                    i += 1
                code = "\n".join(s[4:] if s.startswith("    ") else s for s in block).strip("\n")
                out.append(f"<pre>{html.escape(code)}</pre>")
            else:
                out.append(f"<p>{_inline(text)}</p>")
            continue
        i += 1
    close_dl()
    return "\n".join(out)


def _render_body(body: list) -> str:
    """Render a definition-list body: paragraphs + `::` literal blocks."""
    text = "\n".join(s[4:] if s.startswith("    ") else s for s in body)
    parts = []
    chunks = text.split("\n\n")
    j = 0
    while j < len(chunks):
        chunk = chunks[j].strip("\n")
        if not chunk:
            j += 1
            continue
        merged = " ".join(s.strip() for s in chunk.splitlines())
        if merged.endswith("::"):
            parts.append(f"<p>{_inline(merged[:-2] + ':')}</p>")
            j += 1
            code_lines = []
            while j < len(chunks) and (
                not chunks[j].strip()
                or chunks[j].startswith(("    ", "\t"))
            ):
                code_lines.append(chunks[j].strip("\n"))
                j += 1
            code = "\n\n".join(
                "\n".join(
                    s[4:] if s.startswith("    ") else s
                    for s in c.splitlines()
                )
                for c in code_lines
            )
            parts.append(f"<pre>{html.escape(code)}</pre>")
        else:
            parts.append(f"<p>{_inline(merged)}</p>")
            j += 1
    return "\n".join(parts)


def build():
    sys.path.insert(0, str(REPO))
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "api").mkdir(exist_ok=True)

    src = (ROOT / "source" / "index.rst").read_text()
    api_links = []
    body = rst_to_html(src, api_links)

    page = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>morfem_tpu documentation</title>"
        f"<style>{STYLE}</style></head><body>{body}"
        "<hr><p><em>Built by docs/build.py (stdlib-only; the image has no "
        "sphinx). API pages are generated with pydoc.</em></p>"
        "</body></html>"
    )
    (OUT / "index.html").write_text(page)

    # pydoc API pages for every automodule target (+ the package root)
    modules = [m for m, _ in api_links] or []
    modules = ["morfem_tpu"] + modules
    import os

    cwd = os.getcwd()
    os.chdir(OUT / "api")
    try:
        for mod in modules:
            try:
                pydoc.writedoc(mod)
                print(f"  api: {mod}.html")
            except Exception as exc:  # pragma: no cover
                print(f"  api FAILED for {mod}: {exc}")
    finally:
        os.chdir(cwd)
    print(f"built {OUT / 'index.html'}")


if __name__ == "__main__":
    build()
