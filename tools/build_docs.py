"""Static HTML documentation build (the reference ships a Sphinx/RTD
build — docs/conf.py + readthedocs.yml; this is the offline-installable
equivalent over the same content: rendered markdown pages, executed
tutorial notebooks, and a generated API index).

Build:  python tools/build_docs.py      ->  docs/_build/html/

Uses only baked-in deps (markdown, jinja2, pygments, nbconvert). Pages
come from docs/*.md (nav order below); the three executed tutorial
notebooks from examples/ are converted with nbconvert when present.
"""

import html
import os
import re
import shutil

import markdown
from jinja2 import Template

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
DOCS = os.path.join(ROOT, "docs")
OUT = os.path.join(DOCS, "_build", "html")

PAGES = [
    ("index.md", "Home"),
    ("quickstart.md", "Quickstart"),
    ("scenarios.md", "Scenario model"),
    ("architecture.md", "Architecture"),
    ("scaling.md", "Multi-chip scaling"),
    ("api.md", "API reference"),
    ("parity.md", "Parity notes"),
]

NOTEBOOKS = [
    ("tutorial.ipynb", "Tutorial: vetting a candidate"),
    ("tutorial_followup.ipynb", "Tutorial: follow-up constraints"),
    ("kepler10b.ipynb", "Tutorial: Kepler-10b (real data)"),
]

PAGE_TMPL = Template("""\
<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{{ title }} — triceratops_tpu</title>
<style>
:root { --fg: #1a1a1a; --muted: #666; --accent: #7a4fbf; --bg: #fff;
        --side: #f6f4fa; --border: #e2dcf0; --code: #f4f2f8; }
* { box-sizing: border-box; }
body { margin: 0; color: var(--fg); background: var(--bg);
       font: 16px/1.6 Georgia, 'Times New Roman', serif; }
nav { position: fixed; top: 0; left: 0; bottom: 0; width: 250px;
      overflow-y: auto; background: var(--side);
      border-right: 1px solid var(--border); padding: 1.4rem 1.1rem; }
nav h1 { font-size: 1.05rem; margin: 0 0 1rem;
         font-family: Helvetica, Arial, sans-serif; }
nav h1 a { color: var(--accent); text-decoration: none; }
nav .sec { margin: 1.1rem 0 .3rem; font-size: .72rem; color: var(--muted);
           text-transform: uppercase; letter-spacing: .08em;
           font-family: Helvetica, Arial, sans-serif; }
nav a.item { display: block; padding: .22rem 0; color: var(--fg);
             text-decoration: none; font-size: .92rem;
             font-family: Helvetica, Arial, sans-serif; }
nav a.item.active { color: var(--accent); font-weight: bold; }
nav a.item:hover { color: var(--accent); }
main { margin-left: 250px; padding: 2.2rem 3rem; max-width: 54rem; }
h1, h2, h3 { font-family: Helvetica, Arial, sans-serif;
             line-height: 1.25; }
h1 { font-size: 1.7rem; } h2 { font-size: 1.25rem; margin-top: 2rem; }
a { color: var(--accent); }
code { background: var(--code); padding: .08em .3em; border-radius: 3px;
       font-size: .85em; }
pre { background: var(--code); padding: .8rem 1rem; border-radius: 6px;
      overflow-x: auto; line-height: 1.45; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; font-size: .9rem;
        font-family: Helvetica, Arial, sans-serif; }
th, td { border: 1px solid var(--border); padding: .35rem .6rem;
         text-align: left; }
th { background: var(--side); }
{{ extra_css }}
</style>
</head>
<body>
<nav>
<h1><a href="index.html">triceratops_tpu</a></h1>
<div class="sec">Guide</div>
{% for href, label, active in nav_pages %}
<a class="item{{ ' active' if active }}" href="{{ href }}">{{ label }}</a>
{% endfor %}
<div class="sec">Tutorials</div>
{% for href, label, active in nav_nbs %}
<a class="item{{ ' active' if active }}" href="{{ href }}">{{ label }}</a>
{% endfor %}
</nav>
<main>
{{ body }}
</main>
</body>
</html>
""")


def _nav(current):
    nav_pages = [(p.replace(".md", ".html"), label,
                  p == current) for p, label in PAGES]
    nav_nbs = [(n.replace(".ipynb", ".html"), label, n == current)
               for n, label in NOTEBOOKS
               if os.path.exists(os.path.join(ROOT, "examples", n))]
    return nav_pages, nav_nbs


def _render_md(name, title):
    with open(os.path.join(DOCS, name)) as f:
        text = f.read()
    md = markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}})
    body = md.convert(text)
    # markdown links to .md files -> .html
    body = re.sub(r'href="([\w./-]+)\.md(#[\w-]*)?"',
                  r'href="\1.html\2"', body)
    nav_pages, nav_nbs = _nav(name)
    from pygments.formatters import HtmlFormatter
    css = HtmlFormatter(style="friendly").get_style_defs(".codehilite")
    return PAGE_TMPL.render(title=title, body=body, extra_css=css,
                            nav_pages=nav_pages, nav_nbs=nav_nbs)


def _render_nb(name, title):
    import nbformat
    from nbconvert import HTMLExporter
    nb = nbformat.read(os.path.join(ROOT, "examples", name), as_version=4)
    exp = HTMLExporter(template_name="basic")
    nb_body, _ = exp.from_notebook_node(nb)
    nav_pages, nav_nbs = _nav(name)
    body = ('<div class="nb">%s</div>' % nb_body)
    extra_css = """
.nb .jp-InputPrompt, .nb .jp-OutputPrompt { display: none; }
.nb .highlight { background: var(--code); border-radius: 6px;
                 padding: .6rem .9rem; overflow-x: auto; }
.nb img { max-width: 100%; }
.nb .jp-OutputArea-output pre { background: #fbfaf6; }
"""
    return PAGE_TMPL.render(title=title, body=body, extra_css=extra_css,
                            nav_pages=nav_pages, nav_nbs=nav_nbs)


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    for name, title in PAGES:
        out = os.path.join(OUT, name.replace(".md", ".html"))
        with open(out, "w") as f:
            f.write(_render_md(name, title))
        print("wrote", os.path.relpath(out, ROOT))
    for name, title in NOTEBOOKS:
        src = os.path.join(ROOT, "examples", name)
        if not os.path.exists(src):
            print("skip (absent):", name)
            continue
        out = os.path.join(OUT, name.replace(".ipynb", ".html"))
        try:
            page = _render_nb(name, title)
        except Exception as e:  # nbconvert template issues degrade soft
            page = PAGE_TMPL.render(
                title=title, extra_css="",
                body="<h1>%s</h1><p>notebook conversion failed: %s</p>"
                % (html.escape(title), html.escape(str(e))),
                nav_pages=_nav(name)[0], nav_nbs=_nav(name)[1])
        with open(out, "w") as f:
            f.write(page)
        print("wrote", os.path.relpath(out, ROOT))
    print("done ->", os.path.relpath(OUT, ROOT))


if __name__ == "__main__":
    main()
