"""Built-in model zoo.

Importing this package registers every built-in ModelDef so that
``runner.model: rank.deepfm`` style configs resolve (see core/registry.py).
"""

import importlib

# Families and models are imported lazily by the registry on first lookup;
# this list is for list_models() completeness.
_BUILTIN = [
    "rank.lr",
    "rank.dnn",
    "rank.deepfm",
    "rank.wide_deep",
    "rank.fm",
    "rank.dcn",
    "rank.dcn_v2",
    "rank.xdeepfm",
    "rank.dlrm",
    "rank.din",
    "rank.gatenet",
    "rank.naml",
    "rank.ffm",
    "rank.difm",
    "rank.autoint",
    "rank.bst",
    "rank.dien",
    "rank.deepfefm",
    "rank.dmr",
    "rank.dsin",
    "rank.fgcnn",
    "rank.flen",
    "rank.autofis",
    "rank.sign",
    "rank.dpin",
    "rank.iprec",
    "rank.fat_deepffm",
    "rank.bert4rec",
    "rank.fastformer",
    "rank.deeprec",
    "rank.slot_dnn",
    "rank.logistic_regression",
    "multitask.mmoe",
    "multitask.esmm",
    "multitask.ple",
    "multitask.share_bottom",
    "multitask.aitm",
    "multitask.escm2",
    "multitask.dselect_k",
    "multitask.metaheac",
    "multitask.maml",
    "match.dssm",
    "match.multiview_simnet",
    "match.match_pyramid",
    "match.kim",
    "recall.ncf",
    "recall.word2vec",
    "recall.mind",
    "recall.deepwalk",
    "recall.ensfm",
    "recall.mhcn",
    "recall.tisas",
    "treebased.tdm",
    "graph.gnn",
    "graph.lightgcn",
    "graph.transformer_conv",
    "graph.deepwalk_million",
    "rl.a2c",
    "demo.movie_recall",
    "demo.movie_rank",
    "contentunderstanding.tagspace",
    "contentunderstanding.textcnn",
]


# registry names whose code lives in a differently-named module (e.g. the
# movie demo registers two models from one file)
_MODULE_ALIASES = {
    "demo.movie_recall": "demo.movie_recommand",
    "demo.movie_rank": "demo.movie_recommand",
}


def import_all():
    imported = []
    for name in _BUILTIN:
        module = _MODULE_ALIASES.get(name, name)
        try:
            importlib.import_module(f"paddlerec_tpu.models.{module}.model")
            imported.append(name)
        except ModuleNotFoundError:
            pass  # not built yet
    return imported
