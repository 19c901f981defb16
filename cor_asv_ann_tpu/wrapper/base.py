"""Standalone processor base for PAGE-XML workspace processing.

The reference's processors run on OCR-D core (`ocrd.Processor` with METS
workspaces, worker/server modes; reference wrapper/*.py). This framework
ships its own thin runner so the same processing logic works without the
ocrd stack: a `PageProcessor` iterates the pages of a workspace (METS or
bare directory, utils/workspace.py), feeds parsed PAGE documents to
`process_page`, and stores results under the output fileGrp.

Parameters are validated against the processor's `ocrd-tool`-style schema
(defaults/enum/required), mirroring OCR-D parameter semantics.
"""

import json
import logging

from ..utils.page import parse_page
from ..utils.workspace import Workspace


class ParameterError(ValueError):
    pass


def validate_parameters(schema, params):
    """Apply defaults and validate against an ocrd-tool parameter schema."""
    out = {}
    params = dict(params or {})
    for name, spec in schema.items():
        if name in params:
            value = params.pop(name)
        elif 'default' in spec:
            value = spec['default']
        elif spec.get('required'):
            raise ParameterError('missing required parameter "%s"' % name)
        else:
            continue
        typ = spec.get('type')
        if typ == 'number':
            value = float(value)
        elif typ == 'boolean':
            value = bool(value) if not isinstance(value, str) \
                else value.lower() in ('1', 'true', 'yes')
        elif typ == 'string' and not isinstance(value, str):
            value = str(value)
        if 'enum' in spec and value not in spec['enum']:
            raise ParameterError('parameter "%s" must be one of %s, got %r'
                                 % (name, spec['enum'], value))
        out[name] = value
    if params:
        raise ParameterError('unknown parameters: %s' % list(params))
    return out


class PageProcessor:
    """Base class: subclasses define `executable`, `parameter_schema`, and
    either `process_page(pcgts_list, page_id) -> PageDoc or None`."""

    executable = None
    parameter_schema = {}
    # how many input fileGrps are accepted (min, max); None = unbounded
    input_file_grp_cardinality = (1, 1)

    def __init__(self, parameter=None, logger=None):
        self.logger = logger or logging.getLogger(
            self.executable or self.__class__.__name__)
        self.parameter = validate_parameters(self.parameter_schema,
                                             parameter)
        self.setup()

    def setup(self):
        pass

    def verify(self, input_grps):
        lo, hi = self.input_file_grp_cardinality
        if len(input_grps) < lo or (hi is not None and len(input_grps) > hi):
            raise ParameterError(
                '%s requires between %s and %s input fileGrps, got %d'
                % (self.executable, lo, hi, len(input_grps)))

    def process_workspace(self, workspace, input_grps, output_grp,
                          page_ids=None):
        """Iterate pages; parse one PAGE doc per input fileGrp; store the
        result document (if any) under `output_grp`."""
        if isinstance(workspace, str):
            workspace = Workspace(workspace)
        if isinstance(input_grps, str):
            input_grps = input_grps.split(',')
        self.verify(input_grps)
        grp_files = [workspace.page_files(grp) for grp in input_grps]
        pages = page_ids or [p for p in workspace.page_ids()
                             if p in grp_files[0]]
        self.start_document(workspace, input_grps, output_grp)
        for page_id in pages:
            docs = []
            for files in grp_files:
                if page_id in files:
                    docs.append(parse_page(files[page_id].path))
                else:
                    docs.append(None)
            if docs[0] is None:
                self.logger.error('page "%s" missing from fileGrp %s',
                                  page_id, input_grps[0])
                continue
            result = self.process_page(docs, page_id)
            if result is not None and output_grp:
                workspace.add_file(output_grp, page_id, result.to_bytes(),
                                   file_id='%s_%s' % (output_grp, page_id))
        self.end_document(workspace, input_grps, output_grp)
        workspace.save()

    def start_document(self, workspace, input_grps, output_grp):
        pass

    def end_document(self, workspace, input_grps, output_grp):
        pass

    def process_page(self, docs, page_id):
        raise NotImplementedError


def processor_cli(processor_cls):
    """Build a click CLI for a PageProcessor (OCR-D-style options)."""
    import click

    @click.command(context_settings=dict(help_option_names=['-h', '--help']))
    @click.option('-I', '--input-file-grp', required=True,
                  help='comma-separated input fileGrp(s)')
    @click.option('-O', '--output-file-grp', default=None,
                  help='output fileGrp')
    @click.option('-p', '--parameter', default='{}',
                  help='JSON parameter object or @file')
    @click.option('-P', '--parameter-override', nargs=2, multiple=True,
                  help='single parameter override (name value)')
    @click.option('-g', '--page-id', default=None,
                  help='comma-separated page ids to process')
    @click.option('-m', '--mets', 'directory', default='.',
                  help='workspace directory (containing mets.xml) '
                       'or bare PAGE-XML directory')
    def cli(input_file_grp, output_file_grp, parameter, parameter_override,
            page_id, directory):
        logging.basicConfig(
            format='%(asctime)s.%(msecs)03d %(levelname)s %(name)s - '
                   '%(message)s', datefmt='%H:%M:%S', level=logging.INFO)
        if parameter.startswith('@'):
            with open(parameter[1:]) as f:
                params = json.load(f)
        else:
            params = json.loads(parameter)
        for name, value in parameter_override:
            try:
                params[name] = json.loads(value)
            except json.JSONDecodeError:
                params[name] = value
        proc = processor_cls(parameter=params)
        proc.process_workspace(directory, input_file_grp, output_file_grp,
                               page_ids=page_id.split(',') if page_id
                               else None)

    cli.__doc__ = processor_cls.__doc__
    return cli
