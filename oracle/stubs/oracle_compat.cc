/* Oracle-build compatibility TU.
 *
 * The upstream build requires SSE2+yasm; this TU supplies scalar versions of
 * the two pieces that have no #else fallback:
 *   1. explicit instantiations of Encoder::sad/sse/variance (the scalar
 *      templates live in variance.cc but are never instantiated there), and
 *   2. VP8Raster::Block<16>::inter_predict over SafeRaster (margin-padded
 *      reference), used by the encoder's diamond motion search.
 */
#include <cstring>
#include <cstdint>

#include "/root/reference/src/encoder/variance.cc"

template uint32_t Encoder::sad<4u>( const VP8Raster::Block<4u> &, const TwoDSubRange<uint8_t, 4u, 4u> & );
template uint32_t Encoder::sad<8u>( const VP8Raster::Block<8u> &, const TwoDSubRange<uint8_t, 8u, 8u> & );
template uint32_t Encoder::sad<16u>( const VP8Raster::Block<16u> &, const TwoDSubRange<uint8_t, 16u, 16u> & );
template uint32_t Encoder::sse<4u>( const VP8Raster::Block<4u> &, const TwoDSubRange<uint8_t, 4u, 4u> & );
template uint32_t Encoder::sse<8u>( const VP8Raster::Block<8u> &, const TwoDSubRange<uint8_t, 8u, 8u> & );
template uint32_t Encoder::sse<16u>( const VP8Raster::Block<16u> &, const TwoDSubRange<uint8_t, 16u, 16u> & );
template uint32_t Encoder::variance<4u>( const VP8Raster::Block<4u> &, const TwoDSubRange<uint8_t, 4u, 4u> & );
template uint32_t Encoder::variance<8u>( const VP8Raster::Block<8u> &, const TwoDSubRange<uint8_t, 8u, 8u> & );
template uint32_t Encoder::variance<16u>( const VP8Raster::Block<16u> &, const TwoDSubRange<uint8_t, 16u, 16u> & );

namespace
{

constexpr int16_t kSixtap[8][6] = {
  { 0,   0, 128,   0,   0, 0 },
  { 0,  -6, 123,  12,  -1, 0 },
  { 2, -11, 108,  36,  -8, 1 },
  { 0,  -9,  93,  50,  -6, 0 },
  { 3, -16,  77,  77, -16, 3 },
  { 0,  -6,  50,  93,  -9, 0 },
  { 1,  -8,  36, 108, -11, 2 },
  { 0,  -1,  12, 123,  -6, 0 },
};

inline uint8_t clamp255_i( int v ) { return v < 0 ? 0 : ( v > 255 ? 255 : v ); }

} // namespace

template <>
void VP8Raster::Block<16>::inter_predict( const MotionVector & mv,
                                          const SafeRaster & reference,
                                          TwoDSubRange<uint8_t, 16, 16> & output ) const
{
  constexpr unsigned size = 16;
  const int source_column = column_ * size + ( mv.x() >> 3 );
  const int source_row = row_ * size + ( mv.y() >> 3 );
  const uint8_t mx = mv.x() & 7, my = mv.y() & 7;

  if ( mx == 0 and my == 0 ) {
    for ( unsigned r = 0; r < size; r++ ) {
      memcpy( &output.at( 0, r ), &reference.at( source_column, source_row + r ), size );
    }
    return;
  }

  /* horizontal six-tap into (size+5)-row intermediate, then vertical six-tap */
  uint8_t intermediate[ size + 5 ][ size ];
  const int16_t * hf = kSixtap[ mx ];
  for ( unsigned r = 0; r < size + 5; r++ ) {
    const int rr = source_row + int( r ) - 2;
    for ( unsigned c = 0; c < size; c++ ) {
      const int cc = source_column + int( c );
      intermediate[ r ][ c ] =
        clamp255_i( ( reference.at( cc - 2, rr ) * hf[ 0 ]
                    + reference.at( cc - 1, rr ) * hf[ 1 ]
                    + reference.at( cc,     rr ) * hf[ 2 ]
                    + reference.at( cc + 1, rr ) * hf[ 3 ]
                    + reference.at( cc + 2, rr ) * hf[ 4 ]
                    + reference.at( cc + 3, rr ) * hf[ 5 ]
                    + 64 ) >> 7 );
    }
  }

  const int16_t * vf = kSixtap[ my ];
  for ( unsigned r = 0; r < size; r++ ) {
    for ( unsigned c = 0; c < size; c++ ) {
      output.at( c, r ) =
        clamp255_i( ( intermediate[ r     ][ c ] * vf[ 0 ]
                    + intermediate[ r + 1 ][ c ] * vf[ 1 ]
                    + intermediate[ r + 2 ][ c ] * vf[ 2 ]
                    + intermediate[ r + 3 ][ c ] * vf[ 3 ]
                    + intermediate[ r + 4 ][ c ] * vf[ 4 ]
                    + intermediate[ r + 5 ][ c ] * vf[ 5 ]
                    + 64 ) >> 7 );
    }
  }
}
