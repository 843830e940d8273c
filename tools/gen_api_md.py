"""Regenerates API.md: one-line index of every public symbol."""

import importlib
import inspect
import os

MODULES = [
    'pyg_lib_tpu.ops',
    'pyg_lib_tpu.sampler',
    'pyg_lib_tpu.sampler.dist',
    'pyg_lib_tpu.sampler.padding',
    'pyg_lib_tpu.sampler.dist_service',
    'pyg_lib_tpu.sampler.transport',
    'pyg_lib_tpu.partition',
    'pyg_lib_tpu.classes',
    'pyg_lib_tpu.parallel',
    'pyg_lib_tpu.models',
    'pyg_lib_tpu.loader',
    'pyg_lib_tpu.checkpoint',
    'pyg_lib_tpu.datasets',
    'pyg_lib_tpu.metrics',
    'pyg_lib_tpu.profiling',
]


def first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ''
    return doc.split('\n')[0].strip() if doc else ''


def main():
    out = [
        '# API inventory', '',
        'Auto-generated one-line index of the public surface '
        '(tools/gen_api_md.py; see module', 'docstrings for details; '
        'reference citations live in each docstring).', ''
    ]
    for name in MODULES:
        mod = importlib.import_module(name)
        names = getattr(mod, '__all__', None)
        if names is None:
            names = [n for n in dir(mod) if not n.startswith('_')
                     and getattr(getattr(mod, n), '__module__',
                                 '').startswith('pyg_lib_tpu')]
        out.append(f'## `{name}`')
        out.append('')
        for sym in sorted(set(names)):
            obj = getattr(mod, sym, None)
            line = first_line(obj)
            out.append(f'- `{sym}`' + (f' — {line}' if line else ''))
        out.append('')
    path = os.path.join(os.path.dirname(__file__), '..', 'API.md')
    with open(path, 'w') as f:
        f.write('\n'.join(out))
    print(f'wrote {os.path.abspath(path)}')


if __name__ == '__main__':
    main()
