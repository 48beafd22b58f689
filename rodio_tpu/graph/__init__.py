from .render import compile_step, record, render, render_scan
