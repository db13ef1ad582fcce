"""Minimal self-contained USDA (ASCII USD) document model.

The reference requires the heavy CPython-only ``usd-core`` package for all
USD I/O (``kaolin/io/usd``, optional per ``setup.py:179-182``).  This
module implements a small reader/writer for the USDA subset that the
kaolin workflows produce (Mesh / Points / PointInstancer prims with
time-sampled attributes), so checkpoints and mesh exports work everywhere
and remain loadable by real USD tools.  When ``pxr`` is importable it is
used instead (see :mod:`kaolin_tpu.io.usd.mesh`).
"""

import re
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = ['UsdaPrim', 'UsdaStage', 'parse_usda', 'TimeSampled']


class TimeSampled(dict):
    """Attribute value holder for `attr.timeSamples = { t: v, ... }`."""


class UsdaPrim:
    def __init__(self, name, type_name='', parent=None):
        self.name = name
        self.type_name = type_name
        self.parent = parent
        self.attrs: Dict[str, Any] = {}
        self.metadata: Dict[str, Any] = {}
        self.children: List['UsdaPrim'] = []

    @property
    def path(self):
        if self.parent is None or self.parent.name == '/':
            return f'/{self.name}'
        return f'{self.parent.path}/{self.name}'

    def child(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None

    def define_child(self, name, type_name=''):
        c = self.child(name)
        if c is None:
            c = UsdaPrim(name, type_name, self)
            self.children.append(c)
        elif type_name and not c.type_name:
            c.type_name = type_name
        return c

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


class UsdaStage:
    def __init__(self):
        self.root = UsdaPrim('/', '')
        self.metadata: Dict[str, Any] = {'metersPerUnit': 1,
                                         'upAxis': 'Y'}

    def get_prim(self, path):
        node = self.root
        for part in path.strip('/').split('/'):
            if not part:
                continue
            node = node.child(part)
            if node is None:
                return None
        return node

    def define_prim(self, path, type_name=''):
        node = self.root
        parts = path.strip('/').split('/')
        for i, part in enumerate(parts):
            t = type_name if i == len(parts) - 1 else 'Xform'
            node = node.define_child(part, t)
        return node

    def prims(self):
        for c in self.root.children:
            yield from c.walk()

    # -- serialization -----------------------------------------------------
    def dumps(self):
        lines = ['#usda 1.0', '(']
        for k, v in self.metadata.items():
            lines.append(f'    {_fmt_meta(k, v)}')
        lines.append(')')
        lines.append('')
        for child in self.root.children:
            lines.extend(_dump_prim(child, 0))
        return '\n'.join(lines) + '\n'

    def save(self, path):
        with open(path, 'w') as f:
            f.write(self.dumps())

    @classmethod
    def load(cls, path):
        with open(path, 'r') as f:
            return parse_usda(f.read())


def _fmt_meta(k, v):
    if isinstance(v, str):
        return f'{k} = "{v}"'
    return f'{k} = {v}'


def _fmt_value(v):
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, bool):
        return 'true' if v else 'false'
    if isinstance(v, (int, float)):
        return repr(v)
    arr = np.asarray(v)
    if arr.ndim == 0:
        return repr(arr.item())
    if arr.ndim == 1:
        return '[' + ', '.join(repr(x.item()) if hasattr(x, 'item')
                               else repr(x) for x in arr) + ']'
    if arr.ndim == 2:
        rows = ', '.join(
            '(' + ', '.join(repr(float(x)) if arr.dtype.kind == 'f'
                            else repr(int(x)) for x in row) + ')'
            for row in arr)
        return '[' + rows + ']'
    raise ValueError(f'cannot serialize array of ndim {arr.ndim}')


def _usd_type(name, v):
    """Choose a USD attribute type declaration."""
    if isinstance(v, str):
        return 'string'
    if isinstance(v, bool):
        return 'bool'
    if isinstance(v, int):
        return 'int'
    if isinstance(v, float):
        return 'float'
    arr = np.asarray(v)
    if name == 'points':
        return 'point3f[]'
    if name in ('normals',):
        return 'normal3f[]'
    if arr.ndim <= 1:
        return ('int[]' if arr.dtype.kind in 'iu' else 'float[]')
    if arr.ndim == 2 and arr.shape[1] == 3:
        return ('int3[]' if arr.dtype.kind in 'iu' else 'float3[]')
    if arr.ndim == 2 and arr.shape[1] == 2:
        return 'float2[]'
    return 'float[]'


def _dump_prim(prim, depth):
    pad = '    ' * depth
    head = f'{pad}def {prim.type_name} "{prim.name}"'.rstrip()
    lines = [head, f'{pad}{{']
    inner = '    ' * (depth + 1)
    for name, val in prim.attrs.items():
        if isinstance(val, TimeSampled):
            sample0 = next(iter(val.values()))
            t = _usd_type(name, sample0)
            lines.append(f'{inner}{t} {name}.timeSamples = {{')
            for time_code in sorted(val.keys()):
                lines.append(
                    f'{inner}    {_fmt_time(time_code)}: '
                    f'{_fmt_value(val[time_code])},')
            lines.append(f'{inner}}}')
        else:
            t = _usd_type(name, val)
            lines.append(f'{inner}{t} {name} = {_fmt_value(val)}')
    for c in prim.children:
        lines.extend(_dump_prim(c, depth + 1))
    lines.append(f'{pad}}}')
    return lines


def _fmt_time(t):
    return repr(int(t)) if float(t).is_integer() else repr(float(t))


# -- parsing ---------------------------------------------------------------

_TOKEN_RE = re.compile(r'''
    "(?:[^"\\]|\\.)*"          # string
  | \#[^\n]*                   # comment
  | [{}()\[\]=:,]              # punctuation
  | [^\s{}()\[\]=:,"]+         # atom
''', re.VERBOSE)


def _tokenize(text):
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if tok.startswith('#'):
            continue
        yield tok


class _Parser:
    def __init__(self, tokens):
        self.toks = list(tokens)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, tok):
        got = self.next()
        if got != tok:
            raise ValueError(f'expected {tok!r}, got {got!r} at {self.i}')

    def parse_stage(self):
        stage = UsdaStage()
        if self.peek() == '(':
            self.next()
            depth = 1
            while depth:
                tok = self.next()
                if tok == '(':
                    depth += 1
                elif tok == ')':
                    depth -= 1
        while self.peek() is not None:
            if self.peek() in ('def', 'over', 'class'):
                stage.root.children.append(self.parse_prim(stage.root))
            else:
                self.next()
        return stage

    def parse_prim(self, parent):
        self.next()  # def/over/class
        type_name = ''
        if not self.peek().startswith('"'):
            type_name = self.next()
        name = self.next().strip('"')
        prim = UsdaPrim(name, type_name, parent)
        if self.peek() == '(':  # prim metadata — skip
            self.next()
            depth = 1
            while depth:
                tok = self.next()
                if tok == '(':
                    depth += 1
                elif tok == ')':
                    depth -= 1
        self.expect('{')
        while self.peek() != '}':
            if self.peek() in ('def', 'over', 'class'):
                prim.children.append(self.parse_prim(prim))
            else:
                self.parse_attr(prim)
        self.expect('}')
        return prim

    def parse_attr(self, prim):
        words = []
        # collect type + name tokens until '=' or '{'-style timeSamples
        while self.peek() not in ('=',):
            words.append(self.next())
            if len(words) > 8:
                raise ValueError(f'cannot parse attribute near {words}')
        self.expect('=')
        # rejoin namespaced attribute names the tokenizer split on ':'
        # (e.g. ['float2[]', 'primvars', ':', 'st'] -> 'primvars:st')
        parts = [words.pop()]
        while len(words) >= 2 and words[-1] == ':':
            words.pop()
            parts.insert(0, words.pop())
        name = ':'.join(parts)
        if name.endswith('.timeSamples'):
            base = name[:-len('.timeSamples')]
            self.expect('{')
            samples = TimeSampled()
            while self.peek() != '}':
                t = float(self.next())
                self.expect(':')
                samples[t] = self.parse_value()
                if self.peek() == ',':
                    self.next()
            self.expect('}')
            prim.attrs[base] = samples
        else:
            val = self.parse_value()
            if self.peek() == '(':  # attribute metadata — skip
                self.next()
                depth = 1
                while depth:
                    tok = self.next()
                    if tok == '(':
                        depth += 1
                    elif tok == ')':
                        depth -= 1
            prim.attrs[name] = val

    def parse_value(self):
        tok = self.peek()
        if tok == '[':
            self.next()
            items = []
            while self.peek() != ']':
                items.append(self.parse_value())
                if self.peek() == ',':
                    self.next()
            self.expect(']')
            return np.asarray(items)
        if tok == '(':
            self.next()
            items = []
            while self.peek() != ')':
                items.append(self.parse_value())
                if self.peek() == ',':
                    self.next()
            self.expect(')')
            return np.asarray(items)
        tok = self.next()
        if tok.startswith('"'):
            return tok.strip('"')
        if tok in ('true', 'false'):
            return tok == 'true'
        try:
            if re.fullmatch(r'[+-]?\d+', tok):
                return int(tok)
            return float(tok)
        except ValueError:
            return tok


def parse_usda(text):
    """Parse a USDA document (subset) into a :class:`UsdaStage`."""
    if not text.lstrip().startswith('#usda'):
        raise ValueError('not a usda document')
    return _Parser(_tokenize(text)).parse_stage()
