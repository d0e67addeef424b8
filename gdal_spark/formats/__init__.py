"""Vector file-format drivers (the engine's counterpart of GDAL's
``ogr/ogrsf_frmts/`` driver registry, scoped to the formats a Spark
migration actually needs to ingest): ESRI Shapefile, GeoPackage,
GeoJSON / GeoJSONSeq, and geometry-aware CSV.

Both are written from the public format specifications — the ESRI
"Shapefile Technical Description" (July 1998) and the OGC GeoPackage
Encoding Standard — not from the reference driver code. The Spark-first
part is the scan shape: a driver-side metadata read (tiny .shx / sqlite
catalog) plans byte/rowid ranges, and one Spark task per range parses its
span with vectorized numpy, so a single large file fans out across the
cluster instead of serializing into one task (GDAL reads one file on one
thread; reference: ogr/ogrsf_frmts/shape/, ogr/ogrsf_frmts/gpkg/).
"""

from .shapefile import scan_shapefile, write_shapefile  # noqa: F401
from .geopackage import (  # noqa: F401
    gpkg_raster_info,
    scan_geopackage,
    scan_geopackage_tiles,
    write_geopackage,
    write_geopackage_tiles,
)
from .geojson import (  # noqa: F401
    scan_geojson,
    scan_geojson_seq,
    stream_geojson_seq,
    write_geojson_seq,
)
from .csvdriver import scan_csv_vector, write_csv_vector  # noqa: F401
from .flatgeobuf import (  # noqa: F401
    read_fgb_header,
    scan_flatgeobuf,
    write_flatgeobuf,
)
from .aaigrid import scan_aaigrid, write_aaigrid  # noqa: F401
from .dted import format_dted, parse_dted, scan_dted, write_dted  # noqa: F401
from .envi import format_envi, parse_envi, scan_envi, write_envi  # noqa: F401
from .dxf import parse_dxf, scan_dxf  # noqa: F401
from .mif import parse_mif, scan_mif, write_mif  # noqa: F401
from .tab import read_tab, scan_tab, write_tab  # noqa: F401
from .netcdf import (  # noqa: F401
    format_netcdf,
    netcdf_rasters,
    parse_cdf,
    scan_netcdf,
    write_netcdf,
)
from .srtmhgt import (  # noqa: F401
    format_srtmhgt,
    parse_srtmhgt,
    scan_srtmhgt,
    write_srtmhgt,
)
from .geoparquet import (  # noqa: F401
    geoparquet_metadata,
    scan_geoparquet,
    write_geoparquet,
)
from .gtiff import (  # noqa: F401
    format_gtiff,
    gtiff_levels,
    parse_gtiff,
    plan_gtiff_windows,
    read_gtiff_window,
    read_ifd_chain,
    scan_gtiff,
    scan_gtiff_windowed,
    write_gtiff,
)
from .usgsdem import (  # noqa: F401
    format_usgsdem,
    parse_usgsdem,
    scan_usgsdem,
    write_usgsdem,
)
from .vrt import (  # noqa: F401
    materialize_vrt,
    parse_vrt,
    scan_vrt,
    write_vrt,
    write_warped_vrt,
)
from .mbtiles import (  # noqa: F401
    mbtiles_info,
    scan_mbtiles,
    write_mbtiles,
)
from .kml import scan_kml, write_kml  # noqa: F401
from .gpx import scan_gpx, write_gpx  # noqa: F401
from .gml import scan_gml, write_gml  # noqa: F401
from .filegdb import (  # noqa: F401
    layer_info as filegdb_layer_info,
    list_layers as filegdb_list_layers,
    scan_filegdb,
)
from .zarr import (  # noqa: F401
    list_zarr_arrays,
    read_zarr_array,
    scan_zarr,
    write_zarr,
    zarr_rasters,
)
from .osm import (  # noqa: F401
    osm_blob_spans,
    osm_points,
    osm_way_lines,
    read_osm,
    scan_osm,
    write_osm_pbf,
)
from .spatialite import (  # noqa: F401
    scan_spatialite,
    spatialite_layers,
    spatialite_to_wkb,
    wkb_to_spatialite,
    write_spatialite,
)
from .gsg import (  # noqa: F401
    format_gs7bg,
    format_gsag,
    format_gsbg,
    parse_gsg,
    scan_gsg,
    write_gsg,
)
from .gtx import (  # noqa: F401
    VerticalShift,
    format_gtx,
    parse_gtx,
    scan_gtx,
    write_gtx,
)
from .ntv2 import (  # noqa: F401
    GridShift,
    format_ntv2,
    parse_ntv2,
    register_grid_datum,
    scan_ntv2,
    write_ntv2,
)
from .rst import (  # noqa: F401
    decode_rst,
    format_rst,
    parse_rdc,
    scan_rst,
    write_rst,
)
from .saga import (  # noqa: F401
    decode_saga,
    format_saga,
    parse_sgrd,
    scan_saga,
    write_saga,
)
from .sidecar import (  # noqa: F401
    read_pam,
    read_world_file,
    scan_plain_rasters,
    sidecar_georef,
    write_plain_rasters,
)
from .xyz import scan_xyz, write_xyz  # noqa: F401
from .ehdr import parse_ehdr, scan_ehdr, write_ehdr  # noqa: F401
from .hfa import format_hfa, parse_hfa, scan_hfa, write_hfa  # noqa: F401
from .xlsx import (  # noqa: F401
    materialize as xlsx_materialize,
    parse_xlsx,
    scan_xlsx,
    write_xlsx,
)
from .ods import (  # noqa: F401
    materialize as ods_materialize,
    parse_ods,
    scan_ods,
    write_ods,
)
from .aaigrid import (  # noqa: F401
    format_grassascii,
    format_isg,
    parse_grassascii,
    parse_isg,
    parse_isg_header,
    scan_grassascii,
    scan_isg,
    write_grassascii,
    write_isg,
)
from .gxf import format_gxf, parse_gxf, scan_gxf, write_gxf  # noqa: F401
from .terragen import (  # noqa: F401
    format_terragen,
    parse_terragen,
    scan_terragen,
    write_terragen,
)
from .leveller import (  # noqa: F401
    format_leveller,
    parse_leveller,
    scan_leveller,
    write_leveller,
)
from .pcraster import (  # noqa: F401
    format_pcraster,
    parse_pcraster,
    scan_pcraster,
    write_pcraster,
)
from .jdem import (  # noqa: F401
    format_jdem,
    parse_jdem,
    scan_jdem,
    write_jdem,
)
from .pds import (  # noqa: F401
    format_pds,
    parse_label as parse_pds_label,
    parse_pds,
    scan_pds,
    write_pds,
)
from .isis3 import (  # noqa: F401
    format_isis3,
    parse_isis3,
    scan_isis3,
    write_isis3,
)
from .vicar import (  # noqa: F401
    format_vicar,
    parse_vicar,
    scan_vicar,
    write_vicar,
)
from .isis2 import (  # noqa: F401
    format_isis2,
    parse_isis2,
    scan_isis2,
    write_isis2,
)
from .fits import (  # noqa: F401
    format_fits,
    parse_fits,
    scan_fits,
    write_fits,
)
from .ers import (  # noqa: F401
    format_ers,
    parse_ers,
    scan_ers,
    write_ers,
)
from .gif import (  # noqa: F401
    decode_gif,
    format_gif,
    parse_gif,
    scan_gif,
    write_gif,
)
from .tga import (  # noqa: F401
    decode_tga,
    format_tga,
    parse_tga,
    scan_tga,
    write_tga,
)
from .aig import (  # noqa: F401
    format_aig,
    parse_aig,
    scan_aig,
    write_aig,
)
from .rawgrids import (  # noqa: F401
    format_byn,
    format_lan,
    format_lcp,
    format_roipac,
    format_snodas,
    parse_byn,
    parse_lan,
    parse_lcp,
    parse_roipac,
    parse_snodas,
    scan_byn,
    scan_lan,
    scan_lcp,
    scan_roipac,
    scan_snodas,
    write_byn,
    write_lan,
    write_lcp,
    write_roipac,
    write_snodas,
)
from .nitf import (  # noqa: F401
    format_nitf,
    nitf_texts,
    parse_nitf,
    scan_nitf,
    write_nitf,
)
from .rawgrids2 import (  # noqa: F401
    format_ctg,
    format_eir,
    format_mff,
    format_paux,
    parse_ctg,
    parse_doq2,
    parse_eir,
    parse_mff,
    parse_paux,
    scan_ctg,
    scan_doq2,
    scan_eir,
    scan_mff,
    scan_paux,
    write_ctg,
    write_eir,
    write_mff,
    write_paux,
)
from .dgn import parse_dgn, scan_dgn  # noqa: F401
from .bsb import (  # noqa: F401
    format_bsb,
    parse_bsb,
    scan_bsb,
    write_bsb,
)
from .iscerraster import (  # noqa: F401
    format_isce,
    format_rraster,
    parse_isce,
    parse_rraster,
    scan_isce,
    scan_rraster,
    write_isce,
    write_rraster,
)
from .geodetic4 import (  # noqa: F401
    format_ilwis,
    format_loslas,
    format_ngsgeoid,
    format_sigdem,
    parse_ilwis,
    parse_loslas,
    parse_ngsgeoid,
    parse_sigdem,
    scan_ilwis,
    scan_loslas,
    scan_ngsgeoid,
    scan_sigdem,
    write_ilwis,
    write_loslas,
    write_ngsgeoid,
    write_sigdem,
)
from .landsat import (  # noqa: F401
    format_ndf,
    parse_fast,
    parse_ndf,
    scan_fast,
    scan_ndf,
    write_ndf,
)
from .s57 import parse_s57, scan_s57  # noqa: F401
from .iso8211 import read_iso8211  # noqa: F401
from .grib import index_grib, parse_grib, scan_grib  # noqa: F401
from .pcidsk import (  # noqa: F401
    format_pcidsk,
    parse_pcidsk,
    pcidsk_overviews,
    scan_pcidsk,
    write_pcidsk,
)
from . import rawgrids3  # noqa: F401
from .adrg import parse_adrg, parse_gen, scan_adrg  # noqa: F401
from .iris import parse_iris, scan_iris  # noqa: F401
from .dds import format_dds, parse_dds, scan_dds  # noqa: F401
from .srp import parse_srp, parse_srp_gen, parse_srp_qal, scan_srp  # noqa: F401
from .dimap import read_dimap, read_til, scan_dimap, scan_til  # noqa: F401
from .rmf import parse_rmf, scan_rmf  # noqa: F401
from .pds4 import read_pds4, scan_pds4  # noqa: F401
from .esric import read_esric_level, scan_esric  # noqa: F401
from .mrf import decode_lerc1, read_mrf, scan_mrf  # noqa: F401
from .stacta import read_stacta, scan_stacta  # noqa: F401
from .gti import gti_locations, read_gti, scan_gti  # noqa: F401
from .avce00 import e00_features, parse_e00, scan_avce00  # noqa: F401
from .ceos import parse_ceos_header, read_ceos_window, scan_ceos  # noqa: F401
