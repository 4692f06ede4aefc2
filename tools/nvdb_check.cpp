// Validation tool: reads an uncompressed single-FloatGrid .nvdb with the
// REAL NanoVDB accessors (vendored reference header) and dumps the dense
// value array over the index bbox as raw float32 to stdout. Used by
// tests/test_volume.py to prove ngp_tpu/data/nanovdb_codec.py writes
// byte-correct grids.
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <vector>
#include <nanovdb/NanoVDB.h>

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: nvdb_check file.nvdb\n"); return 1; }
    std::ifstream f(argv[1], std::ios::binary);
    struct { uint64_t magic; uint32_t version; uint16_t gridCount, codec; } header;
    f.read((char*)&header, 16);
    if (header.magic != 0x304244566f6e614eUL) { fprintf(stderr, "bad magic\n"); return 2; }
    if (header.codec != 0) { fprintf(stderr, "compressed\n"); return 3; }
    struct MetaData {
        uint64_t gridSize, fileSize, nameKey, voxelCount;
        uint32_t gridType, gridClass;
        double worldBBox[2][3]; int indexBBox[2][3]; double voxelSize[3];
        uint32_t nameSize; uint32_t nodeCount[4]; uint32_t tileCount[3];
        uint16_t codec, padding; uint32_t version;
    } md;
    static_assert(sizeof(MetaData) == 176, "meta size");
    f.read((char*)&md, sizeof(md));
    std::vector<char> name(md.nameSize);
    f.read(name.data(), md.nameSize);
    std::vector<char> buf(md.gridSize);
    f.read(buf.data(), md.gridSize);
    if (!f) { fprintf(stderr, "short read\n"); return 4; }

    const auto* grid = reinterpret_cast<const nanovdb::FloatGrid*>(buf.data());
    if (!grid->isValid()) { fprintf(stderr, "grid invalid\n"); return 5; }
    fprintf(stderr, "name=%s gridType=%u voxels=%llu\n", grid->gridName(),
            (unsigned)md.gridType, (unsigned long long)md.voxelCount);
    auto acc = grid->tree().getAccessor();
    int x0 = md.indexBBox[0][0], y0 = md.indexBBox[0][1], z0 = md.indexBBox[0][2];
    int x1 = md.indexBBox[1][0], y1 = md.indexBBox[1][1], z1 = md.indexBBox[1][2];
    for (int i = x0; i <= x1; ++i)
        for (int j = y0; j <= y1; ++j)
            for (int k = z0; k <= z1; ++k) {
                float v = acc.getValue({i, j, k});
                fwrite(&v, 4, 1, stdout);
            }
    return 0;
}
