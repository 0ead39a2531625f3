/* Portable C replacements for the yasm (.asm) kernels, used when no NASM
 * assembler is available. Delegates to the C_DEFAULT implementations so
 * behavior is bit-identical (the reference's asm_test guarantees kernel
 * output equality across backends). */
#include "EbDefinitions.h"
#include "EbPictureOperators_C.h"
#include "EbSampleAdaptiveOffset_C.h"

void PictureCopyKernel_SSE2(EB_BYTE src, EB_U32 srcStride, EB_BYTE dst,
                            EB_U32 dstStride, EB_U32 areaWidth,
                            EB_U32 areaHeight)
{
    PictureCopyKernel(src, srcStride, dst, dstStride, areaWidth, areaHeight,
                      1);
}

void PictureAverageKernel_SSE2(EB_BYTE src0, EB_U32 src0Stride, EB_BYTE src1,
                               EB_U32 src1Stride, EB_BYTE dst,
                               EB_U32 dstStride, EB_U32 areaWidth,
                               EB_U32 areaHeight)
{
    PictureAverageKernel(src0, src0Stride, src1, src1Stride, dst, dstStride,
                         areaWidth, areaHeight);
}

static void ZeroOutCoeff(EB_S16 *coeffbuffer, EB_U32 coeffStride,
                         EB_U32 coeffOriginIndex, EB_U32 areaWidth,
                         EB_U32 areaHeight)
{
    EB_U32 i, j;
    for (j = 0; j < areaHeight; j++)
        for (i = 0; i < areaWidth; i++)
            coeffbuffer[j * coeffStride + i + coeffOriginIndex] = 0;
}

void ZeroOutCoeff4x4_SSE(EB_S16 *c, EB_U32 s, EB_U32 o, EB_U32 w, EB_U32 h)
{ ZeroOutCoeff(c, s, o, w, h); }
void ZeroOutCoeff8x8_SSE2(EB_S16 *c, EB_U32 s, EB_U32 o, EB_U32 w, EB_U32 h)
{ ZeroOutCoeff(c, s, o, w, h); }
void ZeroOutCoeff16x16_SSE2(EB_S16 *c, EB_U32 s, EB_U32 o, EB_U32 w, EB_U32 h)
{ ZeroOutCoeff(c, s, o, w, h); }
void ZeroOutCoeff32x32_SSE2(EB_S16 *c, EB_U32 s, EB_U32 o, EB_U32 w, EB_U32 h)
{ ZeroOutCoeff(c, s, o, w, h); }

EB_U32 EbHevcLog2f_SSE2(EB_U32 x)
{
    EB_U32 log = 0;
    while (x >>= 1)
        ++log;
    return log;
}

EB_ERRORTYPE GatherSaoStatisticsLcu16bit_SSE2(
    EB_U16 *inputSamplePtr, EB_U32 inputStride, EB_U16 *reconSamplePtr,
    EB_U32 reconStride, EB_U32 lcuWidth, EB_U32 lcuHeight, EB_S32 *boDiff,
    EB_U16 *boCount, EB_S32 eoDiff[SAO_EO_TYPES][SAO_EO_CATEGORIES + 1],
    EB_U16 eoCount[SAO_EO_TYPES][SAO_EO_CATEGORIES + 1])
{
    return GatherSaoStatisticsLcu_62x62_16bit(
        inputSamplePtr, inputStride, reconSamplePtr, reconStride, lcuWidth,
        lcuHeight, boDiff, boCount, eoDiff, eoCount);
}

EB_ERRORTYPE GatherSaoStatisticsLcu_OnlyEo_90_45_135_16bit_SSE2(
    EB_U16 *inputSamplePtr, EB_U32 inputStride, EB_U16 *reconSamplePtr,
    EB_U32 reconStride, EB_U32 lcuWidth, EB_U32 lcuHeight,
    EB_S32 eoDiff[SAO_EO_TYPES][SAO_EO_CATEGORIES + 1],
    EB_U16 eoCount[SAO_EO_TYPES][SAO_EO_CATEGORIES + 1])
{
    return GatherSaoStatisticsLcu_62x62_OnlyEo_90_45_135_16bit(
        inputSamplePtr, inputStride, reconSamplePtr, reconStride, lcuWidth,
        lcuHeight, eoDiff, eoCount);
}
