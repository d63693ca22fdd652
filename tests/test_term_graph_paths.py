"""Path equivalence for the gated term-graph audits (VERDICT r3 #1):
the broadcast branch and the distributed (cogroup / chained-join)
branch must emit identical rows. The gate is forced to 0 to drive the
scale branch on test data."""

import pandas as pd

from deekseek_ocr___dockerized_api_ray.pipelines import curation

SF = "/root/testdata/sf0.001"


def test_triangles_paths_equal(ray_session):
    lo = curation.term_graph_triangles(SF, broadcast_edges=10**9)
    hi = curation.term_graph_triangles(SF, broadcast_edges=0)
    pd.testing.assert_frame_equal(lo.reset_index(drop=True),
                                  hi.reset_index(drop=True))
    assert int(lo["n_edges"].iloc[0]) > 0
    assert int(lo["n_triangles"].iloc[0]) > 0


def test_assortativity_paths_equal(ray_session):
    lo = curation.term_graph_assortativity(SF, broadcast_nodes=10**9)
    hi = curation.term_graph_assortativity(SF, broadcast_nodes=0)
    pd.testing.assert_frame_equal(lo.reset_index(drop=True),
                                  hi.reset_index(drop=True))
    assert int(lo["n_edges_directed"].iloc[0]) > 0
